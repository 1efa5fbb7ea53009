package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeEncode, BpeEncodeExpr, WordNgramsExpr}

/** Distributed BPE tokenizer induction (Sennrich et al. 2015,
  * arXiv:1508.07909) — the vocabulary-training step of an LLM data
  * pipeline. The reference engine has no tokenizer; this is build-brief
  * extension surface, designed Spark-first:
  *
  *   - The corpus is touched ONCE: `wordCounts` is one map-side-partial
  *     `groupBy(word)` whose shuffle is bounded by |distinct words|, not
  *     corpus size. Everything after operates on that vocab-sized frame.
  *   - Each merge round is (a) a pair-count aggregation over the vocab
  *     frame (map-side partial, exact integer counts), (b) a ONE-row
  *     argmax collect — the global argmax is inherent to BPE, and one row
  *     per round is driver-bounded at any scale — and (c) a narrow
  *     symbol-rewrite map. The frame is eagerly localCheckpoint'd per
  *     round so lineage stays flat across rounds (k rounds would
  *     otherwise stack k interpreted HOF rewrites onto every later plan).
  *   - Encoding learned merges back over the corpus is one narrow
  *     codegen pass ([[graft.functions.BpeEncodeExpr]]).
  *
  * Determinism contract (hash-match oracle): ties in the per-round
  * argmax break by (count DESC, left ASC, right ASC) over exact integer
  * counts — binding-identical in Spark and the DuckDB replay. A merged
  * pair never re-pairs with the following symbol inside the same round
  * (greedy left-to-right, the SQL `replace` semantics — see
  * [[graft.functions.BpeEncode]]).
  *
  * Words containing `'|'` are excluded (frame alphabet of the SQL
  * replay); symbols are Unicode code points plus the `</w>` terminal.
  */
object Bpe {

  case class MergeRule(rank: Int, left: String, right: String, pairCount: Long)

  /** Corpus → (word, cnt): the ONE corpus-wide pass. Tokenization is the
    * [[graft.functions.WordNgrams]] contract (lowercase, explicit
    * whitespace class). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(WordNgramsExpr(col(textCol), 1)).as("word"))
      .where(!col("word").contains("|"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** (word, cnt) → (word, cnt, syms ARRAY<STRING>): code-point characters
    * plus the `</w>` terminal. `substr`-by-character matches DuckDB's
    * character (code point) semantics. */
  def symbolize(words: DataFrame): DataFrame =
    words.withColumn("syms",
      concat(
        expr("transform(sequence(1, char_length(word)), i -> substring(word, i, 1))"),
        array(lit(BpeEncode.EndOfWord))))

  /** Adjacent-pair counts over the symbolized vocab frame, weighted by
    * word count. Map-side partial aggregation; output is bounded by the
    * live pair alphabet, not the corpus. */
  def pairCounts(symbolized: DataFrame): DataFrame =
    symbolized
      // guard single-symbol words (fully merged): Spark's sequence(1, 0)
      // DESCENDS ([1, 0]) instead of returning empty
      .select(explode(expr(
        """CASE WHEN size(syms) < 2
          |  THEN cast(array() AS array<struct<left: string, right: string>>)
          |  ELSE transform(sequence(1, size(syms) - 1),
          |         i -> struct(syms[i-1] AS left, syms[i] AS right)) END""".stripMargin)).as("p"),
        col("cnt"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** One greedy left-to-right merge pass as a fold over the symbol
    * array: carry-based scan, a merge consumes both symbols and resets
    * the carry (scan resumes after the match — `replace` semantics). */
  def mergeColumn(syms: Column, l: String, r: String): Column = {
    val lLit = lit(l).cast("string")
    val rLit = lit(r).cast("string")
    aggregate(
      syms,
      struct(expr("cast(array() as array<string>)").as("out"),
        lit(null).cast("string").as("carry")),
      (acc, x) => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        when(carry.isNull, struct(out.as("out"), x.as("carry")))
          .when(carry === lLit && x === rLit,
            struct(array_append(out, concat(lLit, rLit)).as("out"),
              lit(null).cast("string").as("carry")))
          .otherwise(struct(array_append(out, carry).as("out"), x.as("carry")))
      },
      acc => when(acc.getField("carry").isNull, acc.getField("out"))
        .otherwise(array_append(acc.getField("out"), acc.getField("carry"))))
  }

  /** Learn `merges` BPE rules from the corpus. Returns the driver-side
    * rule list (k rows — bounded by construction; the per-round 1-row
    * argmax collect is the only driver traffic). Stops early if no pair
    * remains.
    *
    * Vocabularies at or below `driverVocabThreshold` distinct words run
    * the merge loop driver-side on the collected (word, cnt) frame —
    * the [[Dedup]] small-graph union-find precedent: the corpus pass
    * (the scale-bound stage) already reduced the data to a bounded
    * frame, and k distributed rounds over a few thousand rows cost k ×
    * (job scheduling + localCheckpoint) for nothing. The collect is
    * bounded by the threshold BY CONSTRUCTION (`limit(T+1)` — if more
    * than T rows come back the distributed loop runs instead), and both
    * paths share the same greedy-pass/argmax semantics
    * ([[BpeEncode.mergePass]]; equivalence spec-pinned). At 100 TB a
    * real vocab (~10⁸ words) takes the distributed path. */
  def train(docs: DataFrame, textCol: String, merges: Int,
      driverVocabThreshold: Int = 1 << 16): Seq[MergeRule] = {
    require(merges >= 1, s"bpe train requires merges >= 1, got $merges")
    val wc = wordCounts(docs, textCol)
    val head = wc.limit(driverVocabThreshold + 1).collect()
    if (head.length <= driverVocabThreshold)
      return trainDriver(head.map(r => (r.getString(0), r.getLong(1))), merges)
    var words = symbolize(wc).localCheckpoint(true)
    val rules = Seq.newBuilder[MergeRule]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rules += MergeRule(rank, l, r, c)
        val prev = words
        words = words.withColumn("syms", mergeColumn(col("syms"), l, r))
          .localCheckpoint(true)
        prev.unpersist(false)
        rank += 1
      }
    }
    words.unpersist(false)
    rules.result()
  }

  /** The bounded driver-side merge loop — byte-identical semantics to
    * the distributed rounds: integer pair counts, argmax under
    * (count DESC, left, right), one greedy pass per round via the same
    * [[BpeEncode.mergePass]] routine the encoder uses. */
  private def trainDriver(words: Array[(String, Long)], merges: Int): Seq[MergeRule] = {
    var vocab: Array[(java.util.ArrayList[String], Long)] =
      words.map { case (w, c) => (BpeEncode.symbols(w), c) }
    val rules = Seq.newBuilder[MergeRule]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      for ((syms, c) <- vocab) {
        var i = 0
        while (i + 1 < syms.size()) {
          val k = (syms.get(i), syms.get(i + 1))
          counts.put(k, counts.getOrDefault(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestK: (String, String) = null
        var bestC = Long.MinValue
        counts.forEach { (k, v) =>
          if (v > bestC || (v == bestC &&
              (k._1 < bestK._1 || (k._1 == bestK._1 && k._2 < bestK._2)))) {
            bestK = k; bestC = v
          }
        }
        rules += MergeRule(rank, bestK._1, bestK._2, bestC)
        vocab = vocab.map { case (syms, c) =>
          (BpeEncode.mergePass(syms, bestK._1, bestK._2), c)
        }
        rank += 1
      }
    }
    rules.result()
  }

  /** Rule list → DataFrame for oracle comparison. */
  def mergesDf(spark: org.apache.spark.sql.SparkSession, rules: Seq[MergeRule]): DataFrame = {
    import spark.implicits._
    rules.toDF("rank", "left", "right", "pair_count")
  }

  /** Encode text with learned rules: the pipe-framed symbol string (see
    * [[graft.functions.BpeEncode]]); token count and fingerprint derive
    * from it with built-ins. */
  def encodeColumn(text: Column, rules: Seq[MergeRule]): Column =
    BpeEncodeExpr(text, rules.sortBy(_.rank).map(r => (r.left, r.right)))

  /** Subword count of an encoded string: every symbol is framed by one
    * `'|'` on each side, so tokens = pipes / 2. */
  def tokenCountColumn(encoded: Column): Column =
    ((length(encoded) - length(regexp_replace(encoded, "\\|", ""))) / 2).cast("long")
}
