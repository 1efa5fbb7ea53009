package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSamplingSpec extends SparkSpec {
  import sqlImplicits._

  private def docs(n: Int, domains: Int) =
    spark.range(n.toLong).select($"id".as("doc_id"),
      concat(lit("d"), ($"id" % domains).cast("string")).as("domain"))

  test("splitColumn assigns every row, near the target fractions, deterministically") {
    val d = docs(4000, 1)
    val split = CorpusSampling.splitColumn($"doc_id", "s1",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    val counts = d.groupBy(split.as("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 4000L)
    // 4000 hash-Bernoulli draws: ±5 sigma around the expectation
    assert(math.abs(counts("train") - 3000L) < 140)
    assert(math.abs(counts("val") - 500L) < 110)
    // deterministic: identical assignment on a re-read of the same ids,
    // regardless of partitioning
    val again = d.repartition(7).select($"doc_id", split.as("s2"))
    val joined = d.select($"doc_id", split.as("s1")).join(again, "doc_id")
    assert(joined.filter($"s1" =!= $"s2").count() === 0L)
  }

  test("splitColumn rejects bad fraction vectors") {
    intercept[IllegalArgumentException] {
      CorpusSampling.splitColumn($"doc_id", "s", Seq("a" -> 0.5, "b" -> 0.6))
    }
    intercept[IllegalArgumentException] {
      CorpusSampling.splitColumn($"doc_id", "s", Seq("only" -> 1.0))
    }
  }

  test("mixtureKeep honors per-domain rates, including the 0 and 1 extremes") {
    val d = docs(4000, 4)
    val kept = d.filter(CorpusSampling.mixtureKeep($"doc_id", $"domain",
      Map("d0" -> 1.0, "d1" -> 0.0, "d2" -> 0.5), defaultRate = 0.25, salt = "m1"))
    val counts = kept.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("d0") === 1000L)           // rate 1.0: everything
    assert(!counts.contains("d1"))           // rate 0.0: nothing
    assert(math.abs(counts("d2") - 500L) < 80)
    assert(math.abs(counts("d3") - 250L) < 70) // defaultRate applies
  }

  test("temperatureMixture: alpha weights, multi-epoch repeats, per-row epoch bound") {
    // 800 'd0' + 100 'd1' + 100 'd2': T=2 (α=.5) → p ∝ sqrt(n):
    // sqrt(800)=28.28, sqrt(100)=10 ×2 → powsum 48.28; budget 1000 →
    // rate(d0) = 1000·(28.28/48.28)/800 ≈ 0.732 (downsampled),
    // rate(d1) = rate(d2) = 1000·(10/48.28)/100 ≈ 2.071 (>2 epochs)
    val d = spark.range(1000L).select($"id".as("doc_id"),
      when($"id" < 800, "d0").when($"id" < 900, "d1").otherwise("d2").as("domain"))
    val out = CorpusSampling.temperatureMixture(d, "doc_id", "domain",
      temperature = 2.0, salt = "t1")
    val perDoc = out.groupBy("doc_id", "domain").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every d0 doc appears 0 or 1 times (rate < 1); every d1/d2 doc 2 or
    // 3 times (floor 2 always, +1 Bernoulli on the remainder)
    assert(perDoc.filter(_._2 == "d0").forall(_._3 == 1L))
    assert(perDoc.filter(_._2 != "d0").forall(t => t._3 == 2L || t._3 == 3L))
    val counts = out.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected per-domain outputs: 800·0.7323 ≈ 586, 100·2.0712 ≈ 207
    assert(math.abs(counts("d0") - 586L) < 60, s"d0 -> ${counts("d0")}")
    assert(math.abs(counts("d1") - 207L) < 25, s"d1 -> ${counts("d1")}")
    assert(math.abs(counts("d2") - 207L) < 25, s"d2 -> ${counts("d2")}")
    // epoch values are dense 0..copies-1 per doc
    val epochs = out.filter($"doc_id" === 850L).select("epoch")
      .collect().map(_.getLong(0)).sorted
    assert(epochs.take(2).toSeq === Seq(0L, 1L))
    // T=1 reproduces proportional sampling: every domain's rate is 1.0
    // (budget = corpus), so output == input exactly, epoch 0 everywhere
    val t1 = CorpusSampling.temperatureMixture(d, "doc_id", "domain", 1.0, "t1")
    assert(t1.count() === 1000L && t1.filter($"epoch" =!= 0L).count() === 0L)
  }

  test("temperatureMixture plan: broadcast rate join, narrow explode, no corpus shuffle") {
    val d = docs(2000, 4)
    val plan = CorpusSampling.temperatureMixture(d, "doc_id", "domain", 2.0, "tp")
      .queryExecution.executedPlan.toString
    // rates (O(#domains) rows) must broadcast into the corpus scan — the
    // corpus itself is never shuffled (the only exchanges feed the tiny
    // counts/totals aggregates)
    assert(plan.contains("BroadcastHashJoin"),
      s"rate join must broadcast, got:\n${plan.take(800)}")
    // the epoch fan-out is a Generate (explode) riding the scan stage
    assert(plan.contains("Generate"), s"epoch explode missing:\n${plan.take(800)}")
  }

  test("temperatureMixture is deterministic under repartition and keeps NULL domains") {
    val base = spark.range(500L).select($"id".as("doc_id"),
      when($"id" % 5 === 0, lit(null).cast("string")).otherwise(
        concat(lit("d"), ($"id" % 3).cast("string"))).as("domain"))
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusSampling.temperatureMixture(df, "doc_id", "domain", 3.0, "t2")
        .select("doc_id", "domain", "epoch").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    val a = run(base.repartition(7))
    val b = run(base.repartition(3, $"domain"))
    assert(a === b, "membership must be a pure function of (id, domain, salt)")
    // NULL is a domain like any other (null-safe rate join): the 100
    // null-keyed rows sample at their own alpha rate, not drop to zero
    assert(a.count(_._2.isEmpty) > 0, "null-domain rows must survive the rate join")
  }

  test("quotaSample keeps min(quota, |group|) rows per group") {
    val d = docs(1000, 5).union(docs(3, 1).withColumn("domain", lit("tiny")))
    val kept = CorpusSampling.quotaSample(d, "domain", "doc_id", quota = 20, salt = "q1")
    val counts = kept.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert((0 until 5).forall(i => counts(s"d$i") === 20L))
    assert(counts("tiny") === 3L)
  }

  test("prefiltered quotaSample equals the plain windowed rank") {
    val d = docs(2000, 4)
    val plain = CorpusSampling.quotaSample(d, "domain", "doc_id", 15, "q2")
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[Long]("doc_id"))).toSet
    val fast = CorpusSampling.quotaSample(d, "domain", "doc_id", 15, "q2",
      prefilterMargin = Some(4.0))
    assert(fast.columns.toSeq === d.columns.toSeq) // both paths share the input schema
    assert(fast.collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("doc_id"))).toSet === plain)
  }

  test("shortfall fallback restores exactness when the pre-filter undershoots") {
    val d = docs(2000, 4)
    val plain = CorpusSampling.quotaSample(d, "domain", "doc_id", 15, "q3")
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[Long]("doc_id"))).toSet
    // margin 0.1 → rate = 0.1·15/500 = 0.003 → the pre-filter admits ~1-2
    // rows per 500-row group (usually emptying some group entirely), so
    // every group trips the < quota shortfall and re-ranks unfiltered
    val fallback = CorpusSampling.quotaSample(d, "domain", "doc_id", 15, "q3",
      prefilterMargin = Some(0.1))
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[Long]("doc_id"))).toSet
    assert(fallback === plain)
  }

  test("hashFraction is uniform enough and engine-stable in [0,1)") {
    val fr = docs(2000, 1).select(CorpusSampling.hashFraction($"doc_id", "u1").as("f"))
    val stats = fr.agg(min($"f"), max($"f"), avg($"f")).head()
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) < 1.0)
    assert(math.abs(stats.getDouble(2) - 0.5) < 0.02)
  }

  test("shuffleShards: exact partition of rows, dense per-shard positions, balanced") {
    val d = docs(2000, 4)
    val out = CorpusSampling.shuffleShards(d, "doc_id", "e0", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2000)
    assert(out.map(_._1).distinct.length == 2000) // every row exactly once
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // positions are a dense 1..n_s ranking inside every shard
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"shard $s")
    }
    // hash sharding stays roughly balanced
    assert(byShard.values.map(_.length).min > 2000 / 8 / 2)
  }

  test("shuffleShards: deterministic under repartition, salt changes the order") {
    val d = docs(500, 2)
    def run(df: org.apache.spark.sql.DataFrame, salt: String) =
      CorpusSampling.shuffleShards(df, "doc_id", salt, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(run(d, "e0").toSeq == run(d.repartition(13), "e0").toSeq)
    assert(run(d, "e0").toSeq != run(d, "e1").toSeq) // epoch reshuffle
  }
}
