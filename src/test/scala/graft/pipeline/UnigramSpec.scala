package graft.pipeline

import graft.SparkSpec
import graft.functions.UnigramCosts
import org.apache.spark.sql.functions._
class UnigramSpec extends SparkSpec {
  import sqlImplicits._

  private def costMap(m: Map[String, Long]): java.util.HashMap[String, java.lang.Long] = {
    val j = new java.util.HashMap[String, java.lang.Long]()
    m.foreach { case (k, v) => j.put(k, v) }
    j
  }

  private def cps(w: String): Array[String] = w.map(_.toString).toArray

  /** Brute-force reference: enumerate every segmentation, rank by
    * (cost, reversed-starts lexicographic) — the documented tie rule. */
  private def naiveSegment(word: String, costs: Map[String, Long],
      maxPieceLen: Int): Seq[String] = {
    def segs(pos: Int): Seq[List[Int]] = // lists of piece starts from pos
      if (pos == word.length) Seq(Nil)
      else (1 to math.min(maxPieceLen, word.length - pos)).flatMap(l =>
        segs(pos + l).map(pos :: _))
    def cost(starts: List[Int]): Long = {
      val bounds = starts :+ word.length
      bounds.sliding(2).map { case Seq(a, b) =>
        costs.getOrElse(word.substring(a, b), UnigramCosts.UnkCost * (b - a))
      }.sum
    }
    def key(starts: List[Int]): String =
      starts.reverse.map(s => f"$s%02d").mkString
    val best = segs(0).minBy(s => (cost(s), key(s)))
    (best :+ word.length).sliding(2).map { case Seq(a, b) =>
      word.substring(a, b) }.toSeq
  }

  test("DP segmentation equals brute-force enumeration with the tie rule (property)") {
    val rnd = new scala.util.Random(42)
    val abc = "abc"
    import scala.jdk.CollectionConverters._
    (1 to 400).foreach { _ =>
      val word = Seq.fill(1 + rnd.nextInt(9))(abc(rnd.nextInt(3))).mkString
      // singles always present (trained vocabularies guarantee this);
      // small cost range forces frequent ties — the regime under test
      val extra = Seq.fill(rnd.nextInt(8)) {
        val p = Seq.fill(1 + rnd.nextInt(3))(abc(rnd.nextInt(3))).mkString
        p -> (1L + rnd.nextInt(50))
      }.toMap
      val vocab = Map("a" -> 30L, "b" -> 31L, "c" -> 32L) ++ extra
      val dp = UnigramCosts.segment(cps(word), costMap(vocab), 3)
      assert(dp.asScala.toSeq === naiveSegment(word, vocab, 3),
        s"word=$word vocab=$vocab")
    }
  }

  test("tie rule: whole-word piece beats equal-cost split (smallest last start)") {
    // 'aa' as one piece costs 20; 'a'+'a' costs 10+10=20 — tie; the
    // whole word (last-piece start 0) must win
    val m = costMap(Map("a" -> 10L, "aa" -> 20L))
    import scala.jdk.CollectionConverters._
    assert(UnigramCosts.segment(cps("aa"), m, 5).asScala.toSeq === Seq("aa"))
  }

  test("encode framing: pipe words dropped, long words unsegmented, unknown chars priced") {
    val m = costMap(Map("a" -> 1L, "b" -> 2L, "ab" -> 2L))
    def enc(s: String) = UnigramCosts.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), m, 5, 6).toString
    assert(enc("ab ba") === "|ab| |b||a|")
    assert(enc("a|b ab") === "|ab|")               // pipe word dropped
    assert(enc("abababa") === "|abababa|")          // > maxWordLen 6: one piece
    assert(enc("az") === "|a||z|")                  // unknown char: UNK-priced single
    assert(enc("") === "")
    assert(enc("AB") === "|ab|")                    // lowercase contract
  }

  test("fit learns frequent words as whole pieces and is deterministic under repartition") {
    val docs = (1 to 60).map(i => (i.toLong,
      "stream stream stream merge merge batch " + (if (i % 3 == 0) "xq" else "zz")))
      .toDF("doc_id", "text")
    val v1 = Unigram.fit(docs, "text", vocabSize = 10, rounds = 2)
    val v2 = Unigram.fit(docs.repartition(7), "text", vocabSize = 10, rounds = 2)
    assert(v1.toSet === v2.toSet)
    val pieces = v1.map(_._1).toSet
    assert(pieces.contains("strea") || pieces.contains("eam") || pieces.contains("am"),
      s"expected subword pieces of the dominant word, got $pieces")
    // the dominant 5-char-or-less words are learned whole
    assert(pieces.contains("merge") && pieces.contains("batch"), s"got $pieces")
    // every corpus character survives as a single-char piece
    assert("streambchxqz".forall(c => pieces.contains(c.toString)), s"got $pieces")
  }

  test("encode of a trained vocab round-trips concatenation (pieces rebuild the words)") {
    val docs = Seq((1L, "window window window value value")).toDF("doc_id", "text")
    val vocab = Unigram.fit(docs, "text", vocabSize = 8, rounds = 2)
    val enc = Unigram.encode(docs, "doc_id", "text", vocab).head().getString(1)
    val rebuilt = enc.split(' ').map(w =>
      w.stripPrefix("|").stripSuffix("|").split("\\|\\|").mkString).mkString(" ")
    assert(rebuilt === "window window window value value")
  }

  test("supplementary (non-BMP) single chars survive the final prune as kept singles") {
    // U+1D11E MUSICAL SYMBOL G CLEF: String.length == 2, code points == 1.
    // The keep-all-single-characters invariant must classify it as a
    // single (DuckDB length() counts code points), never prune it.
    val clef = new String(Character.toChars(0x1D11E))
    val docs = (1 to 40).map(i => (i.toLong,
      s"alpha alpha beta beta gamma delta $clef")).toDF("doc_id", "text")
    val vocab = Unigram.fit(docs, "text", vocabSize = 2, rounds = 2)
    val pieces = vocab.map(_._1).toSet
    assert(pieces.contains(clef), s"supplementary single char pruned: $pieces")
    // and it was NOT one of the take(vocabSize) multi slots: all true
    // multi-code-point pieces still compete for those
    val multis = vocab.map(_._1).filter(p => p.codePointCount(0, p.length) >= 2)
    assert(multis.size <= 2, s"vocabSize=2 multi budget exceeded: $multis")
  }

  test("usage counts are exact integer frequencies (hard-EM invariant)") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val words = Unigram.wordFreqs(docs, "text")
    val costs = Seq("a" -> 10L, "b" -> 10L, "ab" -> 5L)
    val u = Unigram.usage(words, costs, 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(u === Map("ab" -> 2L, "b" -> 1L))
  }
}
