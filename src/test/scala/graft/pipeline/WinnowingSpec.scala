package graft.pipeline

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.Winnow

class WinnowingSpec extends SparkSpec {
  import sqlImplicits._

  /** Naive reference: every window rescanned, rightmost minimum by hex
    * string order, distinct (pos, hash) — the paper's definition with
    * none of the kernel's deque machinery. */
  private def reference(s: String, k: Int, w: Int): Seq[(Int, String)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cps = s.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return Seq.empty
    val hashes = (0 until n).map { i =>
      md.reset()
      md.digest(new String(cps, i, k).getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }
    val nWin = math.max(n - w + 1, 1)
    (0 until nWin).flatMap { j =>
      val win = hashes.slice(j, math.min(j + w, n))
      val m = win.min
      val sel = j + win.lastIndexOf(m)
      Some((sel + 1, hashes(sel)))
    }.distinct
  }

  private def kernel(s: String, k: Int, w: Int): Seq[(Int, String)] =
    Winnow.compute(UTF8String.fromString(s), k, w)
      .map(r => (r.getInt(0), r.getUTF8String(1).toString)).toSeq

  test("kernel matches the naive reference on random strings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val len = rnd.nextInt(60)
      // small alphabet → plenty of equal grams → the tie rule is exercised
      val s = Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString
      for ((k, w) <- Seq((3, 4), (5, 2), (8, 8), (1, 1))) {
        assert(kernel(s, k, w) == reference(s, k, w),
          s"trial $trial k=$k w=$w text='$s'")
      }
    }
  }

  test("shorter than k yields nothing; k..k+w-2 grams yield exactly one fingerprint") {
    assert(kernel("abc", 8, 4).isEmpty)
    assert(kernel("", 8, 4).isEmpty)
    val one = kernel("abcdefghij", 8, 4) // 3 grams < w=4 → single window
    assert(one.size == 1)
    assert(one == reference("abcdefghij", 8, 4))
  }

  test("guarantee: a shared run of k+w-1 chars yields a shared fingerprint") {
    val rnd = new scala.util.Random(7)
    val run = Seq.fill(16 + 8 - 1)(('a' + rnd.nextInt(26)).toChar).mkString
    def noise(n: Int) = Seq.fill(n)(('A' + rnd.nextInt(26)).toChar).mkString
    val a = kernel(noise(40) + run + noise(40), 16, 8).map(_._2).toSet
    val b = kernel(noise(60) + run + noise(20), 16, 8).map(_._2).toSet
    assert((a intersect b).nonEmpty, "23-char shared run must share a fingerprint")
  }

  test("fingerprints explodes distinct locational rows; astral text is code-point indexed") {
    val df = Seq((1L, "a😀bcdefg" /* 😀 is ONE position */)).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(df, "doc_id", "text", k = 3, w = 2)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    // 9 code points → 7 grams; positions must be code-point based (≤ 7)
    assert(fp.nonEmpty && fp.forall(_._1 <= 7))
    val ref = reference("a😀bcdefg", 3, 2).map { case (p, h) => (p.toLong, h) }
    assert(fp.toSeq.sorted == ref.sorted)
  }

  test("overlapPairs finds planted overlap, respects the doc-frequency cap") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val boiler = "COMMON LICENSE HEADER SHARED BY EVERY SINGLE DOCUMENT IN THE CORPUS"
    val docs = (1L to 12L).map { i =>
      val body = if (i <= 2) shared else s"unique body number $i " * 4
      (i, s"$boiler $body tail-$i")
    }.toDF("doc_id", "text")
    val pairs = Winnowing.overlapPairs(docs, "doc_id", "text",
        k = 16, w = 4, maxDocFreq = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 1,2 share `shared`; the boilerplate header (doc_freq 12 > 4)
    // must NOT pair the other ten docs with each other
    assert(pairs.contains((1L, 2L)), s"planted pair missing: $pairs")
    assert(pairs.forall { case (a, b) => a == 1L && b == 2L },
      s"boilerplate-only pairs leaked through the cap: $pairs")
  }

  test("parameter guards") {
    intercept[IllegalArgumentException](
      graft.functions.WinnowExpr(col("text"), 0, 4))
    intercept[IllegalArgumentException](
      graft.functions.WinnowExpr(col("text"), 8, 0))
  }
}
