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
}
