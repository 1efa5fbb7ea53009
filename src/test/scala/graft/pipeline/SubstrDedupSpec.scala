package graft.pipeline

import graft.SparkSpec

class SubstrDedupSpec extends SparkSpec {
  import sqlImplicits._

  // 26-char alphabet block; note the shared run between two plants is the
  // block PLUS its flanking spaces when both sides abut a space — expected
  // outputs below account for the maximal match, not just the block
  private val block = "abcdefghijklmnopqrstuvwxyz"

  test("a shared run >= L is cut from every occurrence, unique text survives") {
    // shared maximal run = " " + block + " " (28 chars; the characters
    // beyond the spaces differ per doc)
    val docs = Seq(
      (1L, s"QQQQQ1 $block 1WWWWW"),
      (2L, s"EEEEE2 $block 2RRRRR"),
      (3L, "entirely unique document with no repeats at all")
    ).toDF("doc_id", "text")
    val out = SubstrDedup.stripDuplicatedSubstrings(docs, "doc_id", "text", minLen = 20)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("QQQQQ11WWWWW", 28L)), s"got ${out(1L)}")
    assert(out(2L) == (("EEEEE22RRRRR", 28L)), s"got ${out(2L)}")
    assert(out(3L) == (("entirely unique document with no repeats at all", 0L)))
  }

  test("intra-document repetition of one long run is removed (both copies)") {
    // "X " + block + " Y " + block + " Z": the duplicated maximal run is
    // " " + block + " " at two sites -> kept text is exactly "XYZ"
    val docs = Seq(
      (1L, s"X $block Y $block Z"),
      (2L, "some other filler so the corpus is not one row")
    ).toDF("doc_id", "text")
    val out = SubstrDedup.stripDuplicatedSubstrings(docs, "doc_id", "text", minLen = 26)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("XYZ", 56L)), s"got ${out(1L)}")
  }

  test("maximal span: a run longer than L is removed whole (islands merge)") {
    val run = block * 3 // 78 chars; shared maximal run = 80 with spaces
    val docs = Seq(
      (1L, s"A $run B"),
      (2L, s"C $run D")
    ).toDF("doc_id", "text")
    val out = SubstrDedup.stripDuplicatedSubstrings(docs, "doc_id", "text", minLen = 40)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("AB", 80L)), s"got ${out(1L)}")
    assert(out(2L) == (("CD", 80L)), s"got ${out(2L)}")
  }

  test("fully-covered documents collapse to empty text, row count stable") {
    val docs = Seq((1L, block * 2), (2L, block * 2)).toDF("doc_id", "text")
    val out = SubstrDedup.stripDuplicatedSubstrings(docs, "doc_id", "text", minLen = 26)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.size == 2)
    assert(out(1L) == (("", 52L)) && out(2L) == (("", 52L)))
  }

  test("documents shorter than L never produce windows") {
    val docs = Seq((1L, "tiny"), (2L, "tiny"), (3L, "")).toDF("doc_id", "text")
    val out = SubstrDedup.stripDuplicatedSubstrings(docs, "doc_id", "text", minLen = 30)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "tiny", 2L -> "tiny", 3L -> ""))
  }

  test("deterministic under repartition") {
    val docs = Seq(
      (1L, s"QQQQQ1 $block 1WWWWW"),
      (2L, s"EEEEE2 $block 2RRRRR"),
      (3L, "entirely unique document with no repeats at all")
    ).toDF("doc_id", "text")
    val a = SubstrDedup.stripDuplicatedSubstrings(docs, "doc_id", "text", 20)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = SubstrDedup.stripDuplicatedSubstrings(docs.repartition(7), "doc_id", "text", 20)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.toSeq == b.toSeq)
  }

  test("minLen is validated") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SubstrDedup.stripDuplicatedSubstrings(docs, "doc_id", "text", 0)
    }
  }
}
