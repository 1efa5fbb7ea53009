package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
  * frequency estimation over the corpus token stream — the
  * bounded-memory structure for "how often does this token appear in
  * 100 TB" when an exact corpus-wide `groupBy(token)` is unaffordable
  * or the sketch must be shipped (it is `depth × width` counters
  * regardless of corpus size, and two sketches merge by addition).
  *
  * Determinism: row hashes are md5-derived (`md5("h:token")`, first 8
  * hex chars mod `width`) so a SQL oracle regenerates the identical
  * sketch — no seeded RNG state to ship. One-sided error is the CMS
  * contract: estimate ≥ true count, with overshoot ≤ ⌈e·n/width⌉ at
  * probability 1 − e^−depth.
  */
object CmSketch {

  /** Lowercased whitespace tokens (the corpus-frequency tokenizer —
    * explicit class, no `\s`, so RE2/Java agree byte-for-byte).
    *
    * `array_remove(.., "")`, NOT `filter(.., t => t =!= "")` (r15):
    * identical output (split emits no nulls, so dropping `""` is the
    * whole filter), but `filter` is a higher-order function —
    * CodegenFallback — so the Generate's child expression evaluated
    * interpreted per row; array_remove keeps the tokenize codegen'd.
    * (Exchange reuse was NOT the issue: AQE's runtime stage cache
    * already shared the word-count exchange between [[freqEstimates]]'
    * two consumers even with the lambda — the r14 after-plan that
    * suggested otherwise was the pre-execution AQE plan, which always
    * prints duplicated subtrees; the EXECUTED plan shows the
    * ReusedExchange. Captured in plans/r15/cms_freq_executed.txt.) */
  def tokens(textCol: Column): Column =
    array_remove(split(lower(trim(textCol)), "[ \\t\\n\\x0B\\f\\r]+"), "")

  /** Deterministic bucket of `tok` under hash row `h`. */
  def bucket(tok: Column, h: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$h:"), tok).cast("binary")), 1, 8), 16, 10)
      .cast("long") % width

  /** The sketch itself: `(h, bucket, cnt)`, at most `depth × width`
    * rows. The depth-fold is a narrow explode; the aggregate's map-side
    * partial collapses each partition to ≤ depth·width counters before
    * the (tiny, fixed-size) shuffle — the whole corpus reduces to a
    * grid that fits in one broadcast regardless of scale. */
  def sketch(df: DataFrame, textCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2, got $depth x $width")
    df.select(explode(tokens(col(textCol))).as("tok"))
      .select(explode(array((0 until depth).map(h =>
        struct(lit(h).as("h"), bucket(col("tok"), h, width).as("bucket"))): _*)).as("hb"))
      .groupBy(col("hb")("h").as("h"), col("hb")("bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** CMS estimates beside exact counts for the exact top-`k` tokens
    * (by `(count DESC, token ASC)` — deterministic at ties): returns
    * `(token, exact_n, cms_n)` with `cms_n ≥ exact_n` guaranteed.
    * The exact pass is the referee that makes the sketch's one-sided
    * error measurable; the estimate pass is a broadcast join of the
    * bounded candidate set against the bounded sketch. */
  def freqEstimates(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 1024, k: Int = 50): DataFrame = {
    // ONE tokenize pass: the exact word-count aggregate this key already
    // pays for its top-k referee also feeds the sketch — the sketch's
    // (h, bucket) counters are Σ over the bucket's tokens of their total
    // occurrence counts, so deriving them from the distinct-token counts
    // is identity on the sketch while (a) the corpus is scanned/exploded
    // once instead of twice and (b) the depth×md5 bucket hashing runs per
    // DISTINCT token, not per occurrence (guide §1.2: remove whole
    // passes first). Both consumers share the word-count exchange
    // (ReusedExchange — no materialization needed). sketch() keeps the
    // occurrence-streamed shape for standalone callers where the exact
    // pass does not exist to piggyback on.
    val tokCounts = df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
    val top = tokCounts
      .orderBy(col("exact_n").desc, col("tok").asc)
      .limit(k)
    val sk = tokCounts
      .select(col("exact_n"), explode(array((0 until depth).map(h =>
        struct(lit(h).as("h"), bucket(col("tok"), h, width).as("bucket"))): _*)).as("hb"))
      .groupBy(col("hb")("h").as("h"), col("hb")("bucket").as("bucket"))
      .agg(sum(col("exact_n")).as("cnt"))
    val probes = top.select(col("tok"), col("exact_n"),
      explode(array((0 until depth).map(h =>
        struct(lit(h).as("h"), bucket(col("tok"), h, width).as("bucket"))): _*)).as("hb"))
      .select(col("tok"), col("exact_n"),
        col("hb")("h").as("h"), col("hb")("bucket").as("bucket"))
    probes.join(broadcast(sk), Seq("h", "bucket"))
      .groupBy(col("tok").as("token"), col("exact_n"))
      .agg(min(col("cnt")).as("cms_n"))
      .select(col("token"), col("exact_n"), col("cms_n"))
  }
}
