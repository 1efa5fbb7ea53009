package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminationSpec extends SparkSpec {
  import sqlImplicits._

  // eval doc 100 is planted verbatim inside train doc 1 (contaminated at
  // every 3-gram of the eval text); train doc 2 shares a 4-shingle
  // boilerplate run with eval doc 101 (below the 5-overlap bar); train
  // doc 3 shares nothing; train doc 4 is too short to shingle.
  private val evalText = "the capital of france is paris and the capital of italy is rome"
  private lazy val eval0 = Seq(
    (100L, evalText),
    (101L, "all rights reserved by the original publisher worldwide")).toDF("doc_id", "text")
  private lazy val train = Seq(
    (1L, s"trivia section follows next $evalText end of section"),
    (2L, "all rights reserved by the original maintainers of this corpus"),
    (3L, "spark shuffles hash partition their keys across executor cores"),
    (4L, "too short")).toDF("doc_id", "text")

  test("contaminationScores measures the exact max single-eval-doc overlap") {
    val scores = Decontamination.contaminationScores(train, eval0, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("max_overlap")).toMap
    // eval 100 has 13 tokens -> 11 3-shingles, 10 DISTINCT ("the capital
    // of" repeats), all present in train doc 1
    assert(scores(1L) === 10L)
    // "all rights reserved by the original" -> 4 shared 3-shingles
    assert(scores(2L) === 4L)
    assert(!scores.contains(3L))
    assert(!scores.contains(4L))
  }

  test("contaminated applies the minOverlap bar; decontaminate drops exactly those") {
    val bad = Decontamination.contaminated(train, eval0, "doc_id", "text", minOverlap = 5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(bad === Set(1L))
    val kept = Decontamination.decontaminate(train, eval0, "doc_id", "text", minOverlap = 5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(2L, 3L, 4L))
    // at bar 4 the boilerplate overlap also falls
    val kept4 = Decontamination.decontaminate(train, eval0, "doc_id", "text", minOverlap = 4)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(kept4.toSeq === Seq(3L, 4L))
  }

  test("broadcast and shuffle plans agree") {
    val a = Decontamination.contaminationScores(train, eval0, "doc_id", "text",
      broadcastEval = true).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Decontamination.contaminationScores(train, eval0, "doc_id", "text",
      broadcastEval = false).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("the eval side joins broadcast (train never shuffles)") {
    val plan = Decontamination.contaminationScores(train, eval0, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast eval join in:\n$plan")
  }

  // ---- embedding-space (semantic) decontamination ----

  private lazy val evalVecs = Seq(
    (10L, Array(1f, 0f, 0f)),
    (11L, Array(0f, 1f, 0f))).toDF("vec_id", "embedding")

  test("semanticContamination flags near-verbatim vectors and keeps distant ones") {
    val train2 = Seq(
      (1L, Array(0.999f, 0.01f, 0f)), // ~eval 10 (paraphrase stand-in)
      (2L, Array(0f, 0f, 1f)), //        orthogonal to both
      (3L, Array(0.1f, 0.995f, 0f)) //   ~eval 11
    ).toDF("vec_id", "embedding")
    val got = Decontamination
      .semanticContamination(train2, evalVecs, "vec_id", "embedding", maxDist = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 10L, true), (2L, 10L, false), (3L, 11L, true)))
  }

  test("semanticContamination argmin ties break to the lower eval id") {
    // equidistant from both eval vectors (45 degrees): tie goes to id 10
    val train2 = Seq((7L, Array(1f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = Decontamination
      .semanticContamination(train2, evalVecs, "vec_id", "embedding", maxDist = 0.5)
      .collect().head
    assert(got.getLong(1) === 10L)
  }

  test("semanticContamination plan is one narrow pass (no join, no exchange)") {
    val train2 = Seq((1L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val plan = Decontamination
      .semanticContamination(train2, evalVecs, "vec_id", "embedding", maxDist = 0.2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"semantic decontamination must be a narrow map:\n$plan")
  }

  test("semanticContamination rejects negative maxDist") {
    intercept[IllegalArgumentException] {
      Decontamination.semanticContamination(train, evalVecs, "vec_id", "embedding", -1.0)
    }
  }

  test("semanticContamination fails loudly when the eval side exceeds the collect cap") {
    val train2 = Seq((1L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Decontamination.semanticContamination(train2, evalVecs, "vec_id", "embedding",
        maxDist = 0.2, maxEvalRows = 1)
    }
    // the error must name the knob so a mis-pointed eval frame is
    // actionable, not a silent driver OOM
    assert(e.getMessage.contains("maxEvalRows"), e.getMessage)
  }
}
