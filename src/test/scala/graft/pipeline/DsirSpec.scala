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

  test("micro_sum kernel matches the aggregate-HOF form bit-for-bit " +
      "(null, empty, whitespace classes, unicode, case folding)") {
    // the r14 optimization replaced the interpreted aggregate() scoring
    // scan with the one-pass codegen MicroSumExpr; the old formulation is
    // pinned here as the reference on adversarial inputs
    val w = Array.tabulate(64)(b => (b * 7 - 93).toLong)
    val rows = Seq(
      (1L, "The quick BROWN fox"), (2L, ""), (3L, "   "),
      (4L, null.asInstanceOf[String]),
      (5L, "tab\tsep\nlines\randvt\fff"),
      (6L, "café NAÏVE Über"), (7L, "İstanbul DİYOR"),
      (8L, "a  b   c "), (9L, "😀 emoji 😀 twice"))
      .toDF("doc_id", "text")
    val wlit = array(w.map(lit(_)).toIndexedSeq: _*)
    val oldForm = aggregate(
      Dedup.tokens(col("text")), lit(0L),
      (acc, t) => acc + element_at(wlit, (Dsir.bucket(t, w.length) + 1L).cast("int")))
    val expected = rows.select(col("doc_id"), oldForm.as("s")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).sortBy(_._1)
    val actual = rows.select(col("doc_id"),
        Dsir.microScore(col("text"), w).as("s")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).sortBy(_._1)
    assert(actual.toSeq === expected.toSeq)
  }
}
