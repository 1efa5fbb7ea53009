package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangIdSpec extends SparkSpec {
  import sqlImplicits._

  private def fixture(n: Int) =
    LangId.fixtureTable((0L until n.toLong).toDF("doc_id"))

  test("training is deterministic under repartition and bounded by the class grid") {
    val fx = fixture(80)
    val m1 = LangId.fit(fx, "text", "lang_label", buckets = 256)
    val m2 = LangId.fit(fx.repartition(7), "text", "lang_label", buckets = 256)
    assert(m1.classes === Seq("lng0", "lng1", "lng2", "lng3"))
    assert(m1.priorsMicro.toSeq === m2.priorsMicro.toSeq)
    assert(m1.weightsMicro.map(_.toSeq).toSeq === m2.weightsMicro.map(_.toSeq).toSeq)
  }

  test("held-out prediction recovers the planted language with high accuracy") {
    val fx = fixture(200).localCheckpoint(true)
    val m = LangId.fit(fx, "text", "lang_label", buckets = 256)
    val preds = LangId.classify(fx, "doc_id", "text", m)
    val joined = fx.filter(col("lang_label").isNull)
      .select("doc_id", "lang_true").join(preds, Seq("doc_id"))
    val n = joined.count()
    val hits = joined.filter(col("lang_pred") === col("lang_true")).count()
    assert(n === 100L)
    assert(hits.toDouble / n >= 0.95, s"held-out accuracy ${hits.toDouble / n}")
  }

  test("scores are exact integer micro-nat sums (classify matches a driver replay)") {
    val fx = fixture(40).localCheckpoint(true)
    val m = LangId.fit(fx, "text", "lang_label", buckets = 64)
    val row = LangId.classify(fx, "doc_id", "text", m)
      .filter(col("doc_id") === 7L).head()
    // driver replay of doc 7's score against every class
    val text = LangId.fixtureText(7L)
    val grams = (0 until text.length - 2).map(i => text.substring(i, i + 3))
    def bucketOf(g: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).take(2).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    val scores = m.classes.indices.map(ci =>
      m.classes(ci) -> (m.priorsMicro(ci) +
        grams.map(g => m.weightsMicro(ci)(bucketOf(g))).sum))
    val best = scores.minBy { case (n, s) => (-s, n) }
    assert(row.getString(1) === best._1)
    assert(row.getLong(2) === best._2)
  }

  test("unbounded label cardinality is rejected before any grid collect") {
    val df = (0L until 40L).map(i => (i, s"label$i", "some text here padded out"))
      .toDF("doc_id", "lang_label", "text")
    val e = intercept[IllegalArgumentException] {
      LangId.fit(df, "text", "lang_label", buckets = 64)
    }
    assert(e.getMessage.contains("classes"))
  }

  test("kernel scoring matches the column-expression form bit-for-bit " +
      "(incl. null, short, non-ASCII and tie inputs)") {
    // the r14 optimization replaced scoreCols' per-class aggregate-HOF
    // argmax fold with the one-pass LangScoreExpr kernel; this pins the
    // old formulation as the reference on adversarial inputs
    val m = LangId.fit(fixture(60), "text", "lang_label", buckets = 64)
    val rows = Seq(
      (1L, LangId.fixtureText(9L)), (2L, ""), (3L, "ab"),
      (4L, null.asInstanceOf[String]),       // null → prior-only argmax
      (5L, "café naïve über résumé"), // multi-byte code points
      (6L, "😀ab😀cd"),  // supplementary (surrogate pairs)
      (7L, LangId.fixtureText(12L) + " " + LangId.fixtureText(13L)))
      .toDF("doc_id", "text")
    // the pre-r14 column formulation, verbatim
    val grams = when(length(col("text")) >= 3,
      transform(sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    val scores = m.classes.indices.map { ci =>
      val wlit = array(m.weightsMicro(ci).map(lit(_)): _*)
      (m.classes(ci),
        lit(m.priorsMicro(ci)) + aggregate(grams, lit(0L),
          (acc, g) => acc + element_at(wlit,
            (LangId.bucket(g, m.buckets) + 1L).cast("int"))))
    }
    val (oldPred, oldMicro) = scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) {
      case ((bn, bs), (n, s)) =>
        (when(s > bs, lit(n)).otherwise(bn), when(s > bs, s).otherwise(bs))
    }
    val expected = rows.select(col("doc_id"), oldPred.as("p"), oldMicro.as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val actual = LangId.classify(rows, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(actual.toSeq === expected.toSeq)
  }

  test("short and empty texts survive (empty gram array, prior-only argmax)") {
    val train = fixture(40)
    val m = LangId.fit(train, "text", "lang_label", buckets = 64)
    val preds = LangId.classify(
      Seq((1L, ""), (2L, "ab")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect()
    // prior-only: the most frequent training class wins (ties -> asc name)
    assert(preds.length === 2 && preds.forall(_.getString(1).startsWith("lng")))
  }
}
