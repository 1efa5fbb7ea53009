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
    * remains. */
  def train(docs: DataFrame, textCol: String, merges: Int): Seq[MergeRule] = {
    require(merges >= 1, s"bpe train requires merges >= 1, got $merges")
    var words = symbolize(wordCounts(docs, textCol)).localCheckpoint(true)
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
