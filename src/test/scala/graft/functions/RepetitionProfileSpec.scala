package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.TextStats

class RepetitionProfileSpec extends SparkSpec {
  import sqlImplicits._

  private def naive(text: String, n: Int): Array[Long] = {
    val toks = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    if (toks.length < n) return Array(0L, 0L, 0L, 0L, 0L)
    val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
    val byGram = grams.groupBy(identity).view.mapValues(_.size.toLong)
    // top gram: highest count, ties to the binary-smallest gram
    val (tg, tc) = byGram.toSeq.minBy { case (g, c) => (-c, g) }
    Array(grams.size.toLong, byGram.size.toLong,
      grams.map(_.length.toLong).sum,
      byGram.collect { case (g, c) if c > 1 => c * g.length }.sum,
      tc * tg.length)
  }

  test("hand-computed profile: counts, chars, duplicated chars") {
    // 2-grams of "a b a b c": "a b"(×2), "b a", "b c" → 4 total,
    // 3 distinct, chars 3+3+3+3=12, dup chars 2×3=6
    val r = RepetitionProfile.compute(UTF8String.fromString("a b a b c"), 2)
    assert(r.toSeq === Seq(4L, 3L, 12L, 6L, 6L)) // top "a b": 2x3=6
    // no repeats → dup chars 0
    val u = RepetitionProfile.compute(UTF8String.fromString("x y z"), 2)
    assert(u.toSeq === Seq(2L, 2L, 6L, 0L, 3L)) // 1-count tie -> smallest "x y"
    // shorter than n → all zero; empty text too
    assert(RepetitionProfile.compute(UTF8String.fromString("one two"), 3).toSeq ===
      Seq(0L, 0L, 0L, 0L, 0L))
    assert(RepetitionProfile.compute(UTF8String.fromString(""), 2).toSeq ===
      Seq(0L, 0L, 0L, 0L, 0L))
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

  test("segment repetition: lines and paragraphs, empty segments dropped") {
    // lines: "dup" x2 + "a" + "b" → 4 segs, 3 distinct, chars 3+3+1+1=8,
    // dup chars 2x3=6; the blank line between does not count
    val l = SegmentRepetition.compute(
      UTF8String.fromString("dup\na\n\ndup\nb"), "\n")
    assert(l.toSeq === Seq(4L, 3L, 8L, 6L))
    // paragraphs (\n\n): "dup\na" | "dup\nb" → no exact dup
    val p = SegmentRepetition.compute(
      UTF8String.fromString("dup\na\n\ndup\nb"), "\n\n")
    assert(p.toSeq === Seq(2L, 2L, 10L, 0L))
    // duplicated paragraph
    val p2 = SegmentRepetition.compute(
      UTF8String.fromString("same para\n\nsame para"), "\n\n")
    assert(p2.toSeq === Seq(2L, 1L, 18L, 18L))
    // no separator → one segment; empty text → zeros
    assert(SegmentRepetition.compute(UTF8String.fromString("abc"), "\n").toSeq ===
      Seq(1L, 1L, 3L, 0L))
    assert(SegmentRepetition.compute(UTF8String.fromString(""), "\n").toSeq ===
      Seq(0L, 0L, 0L, 0L))
  }

  test("gopherRepetition: 13-rule battery cuts a top-gram-dominated doc, keeps diverse text") {
    val df = Seq(
      (1L, "buy now " * 20 + "unrelated tail"),       // top-2-gram dominated
      (2L, "the quick brown fox jumps over a lazy dog near riverbank today"),
      (3L, "same line\nsame line\nsame line\nsame line\nother")) // dup lines
      .toDF("id", "text")
    val g = TextStats.gopherRepetition(col("text"))
    val out = df.select(col("id"), g.getField("keep").as("keep"),
        g.getField("top2_char_frac").as("t2"),
        g.getField("dup_line_frac").as("dl"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(!out(1L)._1 && out(1L)._2 > 0.20, s"got ${out(1L)}")
    assert(out(2L)._1, s"diverse text must keep: ${out(2L)}")
    assert(!out(3L)._1 && out(3L)._3 > 0.30, s"dup lines must cut: ${out(3L)}")
  }

  test("top-gram count ties break in UTF-8 byte order, not UTF-16 code units") {
    // U+10000 (surrogate pair, UTF-8 f0 90 80 80) vs U+E000 (UTF-8 ee 80 80):
    // UTF-16 compares the high surrogate 0xD800 < 0xE000 → supplementary
    // first; UTF-8 bytes compare 0xF0 > 0xEE → U+E000 first. The oracle's
    // ORDER BY gram compares UTF-8 in DuckDB, so the kernel must agree.
    val supp = new String(Character.toChars(0x10000))
    val pua = "\uE000"
    assert(RepetitionProfile.utf8Less(pua, supp))
    assert(!RepetitionProfile.utf8Less(supp, pua))
    // tied single-occurrence... make both grams appear twice, tied counts
    val text = s"$supp $supp $pua $pua"
    val out = RepetitionProfile.compute(UTF8String.fromString(text), 1)
    // top gram must be the UTF-8-smaller U+E000: top_gram_chars = 2 occ × 1 char
    assert(out(4) === 2L)
  }

  test("null text yields null profile (nullSafeEval contract)") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a a a"))).toDF("id", "text")
    val rows = df.select(TextStats.ngramCount(col("text"), 2).as("g"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rows.toSeq === Seq(None, Some(2L)))
  }
}
