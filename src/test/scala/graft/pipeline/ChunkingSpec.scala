package graft.pipeline

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import sqlImplicits._

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[(Long, Long, Long, String)] =
    Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", size, overlap)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)

  test("short doc is one whole chunk; empty doc survives as one empty chunk") {
    assert(chunksOf("hello", 10, 3) == Seq((1L, 1L, 5L, "hello")))
    assert(chunksOf("", 10, 3) == Seq((1L, 1L, 0L, "")))
  }

  test("exact stride multiple: last chunk ends exactly at the doc end") {
    // len 20, size 10, overlap 5 → stride 5 → starts 1,6,11 (1+ceil(10/5)=3)
    val c = chunksOf("abcdefghijklmnopqrst", 10, 5)
    assert(c == Seq(
      (1L, 1L, 10L, "abcdefghij"),
      (2L, 6L, 10L, "fghijklmno"),
      (3L, 11L, 10L, "klmnopqrst")))
  }

  test("ragged tail: final chunk is short but reaches the end") {
    // len 13, size 10, overlap 5 → stride 5 → 1+ceil(3/5)=2 chunks
    val c = chunksOf("abcdefghijklm", 10, 5)
    assert(c == Seq((1L, 1L, 10L, "abcdefghij"), (2L, 6L, 8L, "fghijklm")))
  }

  test("coverage property: every char of every doc is inside some chunk") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val len = rnd.nextInt(1000)
      val text = Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      val size = 1 + rnd.nextInt(100)
      val overlap = rnd.nextInt(size)
      val c = chunksOf(text, size, overlap)
      val stride = size - overlap
      // contiguity: chunk i starts at 1 + (i-1)*stride
      c.foreach { case (idx, off, _, _) => assert(off == 1 + (idx - 1) * stride) }
      // last chunk reaches the end; reassembly through the overlap
      // reconstructs the document exactly
      val last = c.last
      assert(last._2 + last._3 - 1 == len.toLong || (len == 0 && last._3 == 0))
      // rebuild via offsets: append only the part of each chunk beyond
      // what earlier chunks already covered
      val byOffset = new StringBuilder
      c.foreach { case (_, off, _, t) =>
        val from = (byOffset.length - (off - 1)).toInt
        if (from < t.length) byOffset.append(t.substring(math.max(from, 0)))
      }
      assert(byOffset.toString == text, s"size=$size overlap=$overlap len=$len")
    }
  }

  test("parameter guards") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunk(df, "doc_id", "text", 0, 0))
    intercept[IllegalArgumentException](Chunking.chunk(df, "doc_id", "text", 10, 10))
    intercept[IllegalArgumentException](Chunking.chunk(df, "doc_id", "text", 10, -1))
  }
}
