package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.TextStats

class RepetitionProfileSpec extends SparkSpec {
  import sqlImplicits._

  private def naive(text: String, n: Int): Array[Long] = {
    val toks = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    if (toks.length < n) return Array(0L, 0L, 0L, 0L)
    val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
    val byGram = grams.groupBy(identity).view.mapValues(_.size.toLong)
    Array(grams.size.toLong, byGram.size.toLong,
      grams.map(_.length.toLong).sum,
      byGram.collect { case (g, c) if c > 1 => c * g.length }.sum)
  }

  test("hand-computed profile: counts, chars, duplicated chars") {
    // 2-grams of "a b a b c": "a b"(×2), "b a", "b c" → 4 total,
    // 3 distinct, chars 3+3+3+3=12, dup chars 2×3=6
    val r = RepetitionProfile.compute(UTF8String.fromString("a b a b c"), 2)
    assert(r.toSeq === Seq(4L, 3L, 12L, 6L))
    // no repeats → dup chars 0
    val u = RepetitionProfile.compute(UTF8String.fromString("x y z"), 2)
    assert(u.toSeq === Seq(2L, 2L, 6L, 0L))
    // shorter than n → all zero; empty text too
    assert(RepetitionProfile.compute(UTF8String.fromString("one two"), 3).toSeq ===
      Seq(0L, 0L, 0L, 0L))
    assert(RepetitionProfile.compute(UTF8String.fromString(""), 2).toSeq ===
      Seq(0L, 0L, 0L, 0L))
  }

  test("kernel matches the naive reference on random token streams (seeded)") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "g", "delta-x", "42", "word,")
    val seps = Vector(" ", "  ", "\t", "\n", " \r ")
    (1 to 200).foreach { _ =>
      val t = (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
      val n = 1 + rnd.nextInt(4)
      assert(RepetitionProfile.compute(UTF8String.fromString(t), n).toSeq ===
        naive(t, n).toSeq, s"text=<$t> n=$n")
    }
  }

  test("column stats: fractions and codegen evaluation through a projection") {
    val df = Seq(
      (1L, "a b a b c"),
      (2L, "x y z"),
      (3L, "one"),
      (4L, "w w w w")).toDF("id", "text")
    val out = df.select(col("id"),
        TextStats.ngramCount(col("text"), 2).as("g"),
        round(TextStats.dupNgramFrac(col("text"), 2), 6).as("f"),
        round(TextStats.dupNgramCharFrac(col("text"), 2), 6).as("cf"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((4L, 0.25, 0.5)))   // 1 - 3/4; 6/12
    assert(out(2L) === ((2L, 0.0, 0.0)))
    assert(out(3L) === ((0L, 0.0, 0.0)))    // no 2-grams → zeros, not NaN
    assert(out(4L) === ((3L, round2(1.0 - 1.0 / 3.0), 1.0))) // "w w"×3
  }

  private def round2(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("null text yields null profile (nullSafeEval contract)") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a a a"))).toDF("id", "text")
    val rows = df.select(TextStats.ngramCount(col("text"), 2).as("g"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rows.toSeq === Seq(None, Some(2L)))
  }
}
