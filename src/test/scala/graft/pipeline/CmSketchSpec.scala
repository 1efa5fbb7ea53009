package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmSketchSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val docs = Seq(
    (1L, "alpha alpha beta gamma"),
    (2L, "alpha beta beta delta"),
    (3L, "Alpha gamma")).toDF("doc_id", "text")

  test("sketch has at most depth x width rows and total mass = depth x tokens") {
    val sk = CmSketch.sketch(docs, "text", depth = 4, width = 16).collect()
    assert(sk.length <= 4 * 16)
    assert(sk.map(_.getAs[Long]("cnt")).sum === 4L * 10L) // 10 tokens
    assert(sk.forall(r => r.getAs[Int]("h") >= 0 && r.getAs[Int]("h") < 4))
    assert(sk.forall(r => { val b = r.getAs[Long]("bucket"); b >= 0 && b < 16 }))
  }

  test("estimates are one-sided: cms_n >= exact_n, exact at wide width") {
    // width 4096 >> vocab 4: collisions are md5-improbable -> exact
    val out = CmSketch.freqEstimates(docs, "text", depth = 4, width = 4096, k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size === 4) // alpha, beta, gamma, delta ('Alpha' lowercases in)
    assert(out("alpha") === ((4L, 4L))) // 'Alpha' lowercases in
    assert(out("beta") === ((3L, 3L)))
    assert(out.forall { case (_, (e, c)) => c >= e })
  }

  test("estimates stay one-sided under heavy collision (width 2)") {
    val out = CmSketch.freqEstimates(docs, "text", depth = 2, width = 2, k = 10).collect()
    assert(out.forall(r => r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n")))
    // every bucket holds the full mass bound: estimate <= total tokens
    assert(out.forall(r => r.getAs[Long]("cms_n") <= 10L))
  }

  test("top-k cut is deterministic at count ties (token ascending)") {
    val d = Seq((1L, "b a c a b c d")).toDF("doc_id", "text")
    val top = CmSketch.freqEstimates(d, "text", depth = 4, width = 1024, k = 3)
      .collect().map(_.getString(0)).sorted
    assert(top.toSeq === Seq("a", "b", "c")) // d loses the tie to a,b,c
  }

  test("sketches merge by addition: sum of per-shard sketches == full-corpus sketch") {
    val a = docs.filter($"doc_id" <= 1L)
    val b = docs.filter($"doc_id" > 1L)
    val merged = CmSketch.sketch(a, "text", 4, 16)
      .unionByName(CmSketch.sketch(b, "text", 4, 16))
      .groupBy("h", "bucket").agg(sum($"cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = CmSketch.sketch(docs, "text", 4, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === full)
  }

  test("the sketch side of the estimate join is broadcast") {
    val plan = CmSketch.freqEstimates(docs, "text", depth = 4, width = 1024, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
