package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeEncode

/** BPE tokenizer induction ([[Bpe]]) — greedy-merge semantics, argmax
  * tie-break determinism, and equivalence with an independent naive
  * single-JVM reference implementation (different code path from both
  * the distributed trainer and the codegen encoder).
  */
class BpeSpec extends SparkSpec {
  import sqlImplicits._

  // ---- independent naive reference (spec-local, list-of-symbols form) --

  private def naiveSymbols(w: String): List[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toList :+ "</w>"

  private def naiveMerge(syms: List[String], l: String, r: String): List[String] = syms match {
    case a :: b :: rest if a == l && b == r => (l + r) :: naiveMerge(rest, l, r)
    case a :: rest => a :: naiveMerge(rest, l, r)
    case Nil => Nil
  }

  private def naiveTrain(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.groupMapReduce { case (w, _) => naiveSymbols(w) } { case (_, c) => c }(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; pair <- syms.zip(syms.tail))
        counts(pair) = counts.getOrElse(pair, 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.groupMapReduce { case (syms, _) => naiveMerge(syms, l, r) } {
          case (_, c0) => c0
        }(_ + _)
      }
    }
    out.result()
  }

  // ---- greedy pass semantics ----

  test("mergePass is greedy left-to-right and never re-pairs a merged symbol") {
    def pass(syms: Seq[String], l: String, r: String): Seq[String] = {
      val in = new java.util.ArrayList[String]()
      syms.foreach(in.add)
      val out = BpeEncode.mergePass(in, l, r)
      (0 until out.size()).map(out.get)
    }
    assert(pass(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(pass(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(pass(Seq("a", "b", "a", "b"), "b", "a") === Seq("a", "ba", "b"))
    assert(pass(Seq("x"), "a", "b") === Seq("x"))
  }

  test("mergeColumn fold matches mergePass on adversarial overlap shapes") {
    val cases = Seq(
      Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("a", "b", "a", "b"),
      Seq("b", "a", "a", "b"), Seq("a"), Seq("a", "a"))
    val df = cases.toDF("syms")
      .select(Bpe.mergeColumn(col("syms"), "a", "a").as("merged"))
    val got = df.collect().map(_.getSeq[String](0).toList)
    val want = cases.map { s =>
      val in = new java.util.ArrayList[String](); s.foreach(in.add)
      val out = BpeEncode.mergePass(in, "a", "a")
      (0 until out.size()).map(out.get).toList
    }
    assert(got.toSeq === want)
  }

  // ---- training ----

  test("train matches the naive reference on a hand corpus (Sennrich shape)") {
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest widest",
      "widest widest").toDF("text")
    val got = Bpe.train(docs, "text", merges = 6)
      .map(r => (r.left, r.right, r.pairCount))
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L).toMap
    val want = naiveTrain(words, 6)
    assert(got === want)
    // first merge on this corpus: 'e','s' (count 9: newest 6 + widest 3)
    assert(got.head === (("e", "s", 9L)))
  }

  test("train is deterministic under repartitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.train(docs.repartition(1), "text", merges = 4)
    val b = Bpe.train(docs.repartition(7, col("doc_id")), "text", merges = 4)
    assert(a === b)
  }

  test("distributed rounds and the bounded driver loop learn identical rules") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val driver = Bpe.train(docs, "text", merges = 8) // vocab ≤ threshold
    val dist = Bpe.train(docs, "text", merges = 8, driverVocabThreshold = 0)
    assert(driver === dist)
  }

  test("train rejects merges < 1 and stops early when pairs run dry") {
    intercept[IllegalArgumentException] { Bpe.train(Seq("a").toDF("text"), "text", 0) }
    // one-char word: symbols (a, </w>) admit exactly one merge, then
    // single-symbol words have no adjacent pairs left
    val rules = Bpe.train(Seq("a a a").toDF("text"), "text", merges = 5)
    assert(rules.map(r => (r.left, r.right)) === Seq(("a", "</w>")))
  }

  // ---- encoding ----

  test("encodeColumn renders the pipe framing and applies rules in rank order") {
    val rules = Seq(
      Bpe.MergeRule(0, "a", "a", 0L),
      Bpe.MergeRule(1, "aa", "</w>", 0L))
    val df = Seq("aaa ab", "AA\u000Ba", "x|y keep").toDF("text")
      .select(Bpe.encodeColumn(col("text"), rules).as("e"))
    val got = df.collect().map(_.getString(0))
    // aaa -> [aa,a,</w>]; ab -> [a,b,</w>]; rule 1 then needs [aa,</w>] adjacency
    assert(got(0) === "|aa||a||</w>| |a||b||</w>|")
    // lowercased, vertical tab splits words, aa + </w> merges via rule 1
    assert(got(1) === "|aa</w>| |a||</w>|")
    // the pipe-containing word is dropped (frame alphabet), others keep
    assert(got(2) === "|k||e||e||p||</w>|")
  }

  test("tokenCountColumn counts symbols of the framed encoding") {
    val rules = Seq(Bpe.MergeRule(0, "a", "a", 0L))
    val df = Seq("aaaa bb", "").toDF("text")
      .select(Bpe.tokenCountColumn(Bpe.encodeColumn(col("text"), rules)).as("n"))
    // aaaa -> aa aa </w> (3), bb -> b b </w> (3); empty -> 0
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(6L, 0L))
  }

  test("encode kernel agrees with the naive reference over real corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rules = Bpe.train(docs, "text", merges = 8)
    val got = docs.orderBy("doc_id").limit(20)
      .select(col("text"), Bpe.encodeColumn(col("text"), rules).as("e"))
      .collect()
    for (row <- got) {
      val text = row.getString(0)
      val want = text.toLowerCase.split("[ \t\n\u000B\f\r]+").filter(_.nonEmpty)
        .filterNot(_.contains("|"))
        .map { w =>
          var syms = naiveSymbols(w)
          rules.foreach(r => syms = naiveMerge(syms, r.left, r.right))
          syms.mkString("|", "||", "|")
        }.mkString(" ")
      assert(row.getString(1) === want)
    }
  }
}
