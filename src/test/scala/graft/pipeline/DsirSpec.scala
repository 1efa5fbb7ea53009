package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import sqlImplicits._

  private val corpus = Seq(
    (0L, "spark stream window batch", true),
    (1L, "spark stream window merge", true),
    (2L, "spark window batch merge", true),
    (3L, "cat dog bird fish", false),
    (4L, "cat dog bird mouse", false),
    (5L, "spark stream cat dog", false) // mixed: should land between
  ).toDF("doc_id", "text", "is_target")

  test("target-like documents score above off-target documents") {
    val w = Dsir.featureLogRatios(corpus, "text", col("is_target"), buckets = 64)
    val scores = Dsir.importanceScores(corpus, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(0L) > scores(3L))
    assert(scores(1L) > scores(4L))
    // the mixed doc sits strictly between a pure-target and a pure-raw doc
    assert(scores(5L) < scores(0L) && scores(5L) > scores(3L))
  }

  test("selectTopK is deterministic under repartition and cuts by (score, id)") {
    val a = Dsir.selectTopK(corpus, "doc_id", "text", col("is_target"), 64, 3)
      .collect().map(_.getLong(0)).toSeq
    val b = Dsir.selectTopK(corpus.repartition(7), "doc_id", "text", col("is_target"), 64, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a.toSet === Set(0L, 1L, 2L)) // the pure-target docs win
  }

  test("weight array covers every bucket and empty docs score zero") {
    val w = Dsir.featureLogRatios(corpus, "text", col("is_target"), buckets = 32)
    assert(w.length === 32)
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val s = Dsir.importanceScores(empty, "doc_id", "text", w).head()
    assert(s.getDouble(1) === 0.0)
  }

  test("scoring plan is narrow: no shuffle beyond the top-k cut") {
    val w = Dsir.featureLogRatios(corpus, "text", col("is_target"), buckets = 64)
    val plan = Dsir.importanceScores(corpus, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n${plan.take(600)}")
  }
}
