package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality bucketing (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", arXiv:1911.00359 §3.3): score every document by the perplexity
  * of a small LM trained on a trusted target slice, then split the corpus
  * into head / middle / tail tertiles by score. CCNet trains a 5-gram
  * KenLM on Wikipedia; the re-expression is a hashed-feature bigram LM —
  * the same fixed-bucket trick as [[Dsir]] — which keeps both training
  * passes bounded and the scorer a pure narrow map.
  *
  *   logp(w_i | w_{i-1}) = ln(c(bigram)+1) - ln(c(context)+B)    (Laplace)
  *   doc score           = -mean logp  (a log-perplexity; lower = fluent)
  *
  * Scale shape: training is one exploded token scan whose shuffle
  * collapses to B keys under map-side partial aggregation (the counts are
  * a bounded driver array, broadcast back as literals); scoring is one
  * narrow pass per document summing FROZEN integer micro-nats, so scores
  * are exact order-free integer sums and a SQL replay lands on identical
  * values. The tertile cut deliberately avoids a global-sort `ntile`:
  * the two cutoffs come from one exact-percentile aggregate (tree-reduced
  * partials, one final row) and bucket assignment is a broadcast-literal
  * comparison — no corpus-wide window at any scale.
  */
object LmPpl {

  /** Frozen per-bucket micro-nat tables `(num, den)` for a hashed bigram
    * LM estimated on `targetPred` rows: `num(b) = round(1e6*ln(c_big+1))`
    * over bigram buckets, `den(b) = round(1e6*ln(c_ctx+B))` over context
    * (leading-token) buckets. Both aggregates are bounded at B rows. */
  def bigramLogTables(df: DataFrame, textCol: String, targetPred: Column,
      buckets: Int): (Array[Long], Array[Long]) = {
    val toks = Dedup.tokens(col(textCol))
    val seed = df.filter(targetPred)
    def freeze(counts: Map[Int, Long], add: Long): Array[Long] =
      Array.tabulate(buckets) { b =>
        val c = counts.getOrElse(b, 0L)
        math.floor(math.log((c + add).toDouble) * 1e6 + 0.5).toLong
      }
    // ONE seed scan for both tables (r14: this ran as two separate
    // explode+aggregate jobs over the same slice): bigram and context
    // features explode together under a kind tag, the bounded (kind, b)
    // grid comes back in one collect, and the two count maps split
    // driver-side — bit-identical counts, half the passes and actions.
    val n = greatest(size(toks) - 1, lit(0))
    val tagged = concat(
      transform(bigrams(toks), g => struct(lit(0).as("k"), g.as("v"))),
      transform(slice(toks, lit(1), n), t => struct(lit(1).as("k"), t.as("v"))))
    val grid = seed
      .select(explode(tagged).as("kv"))
      .select(col("kv")("k").as("k"), Dsir.bucket(col("kv")("v"), buckets).as("b"))
      .groupBy("k", "b").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    val bigCounts = grid.collect { case ((0, b), c) => b -> c }
    val ctxCounts = grid.collect { case ((1, b), c) => b -> c }
    (freeze(bigCounts, 1L), freeze(ctxCounts, buckets.toLong))
  }

  /** Adjacent-token bigram strings `"prev cur"` (the hashed LM feature).
    * `zip_with` over two slices, NOT `transform(sequence, i =>
    * element_at(toks, i))`: a lambda body re-evaluates every expression
    * it references per element, so indexing into the un-materialized
    * token-split expression is O(tokens²) per document (measured 15.9 s
    * vs 0.4 s for the whole key at sf0.1). The slices are HOF arguments
    * — evaluated once per row. */
  def bigrams(toks: Column): Column = {
    val n = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Per-document log-perplexity against frozen tables: exact integer
    * micro-nat sums, divided once at the end. Documents with fewer than
    * two tokens score 0 (no bigram evidence).
    *
    * One codegen pass ([[graft.functions.BigramPplExpr]], r15 — the
    * LangId/DSIR kernel pattern applied to the last interpreted scorer):
    * the previous `aggregate()` HOF pair was CodegenFallback, so the
    * scoring scan ran interpreted with per-row token/bigram array
    * materializations. Identical semantics incl. NULL → 0.0
    * (`LmPplSpec` pins the old column formulation as reference). */
  def logPpl(df: DataFrame, idCol: String, textCol: String,
      numMicro: Array[Long], denMicro: Array[Long]): DataFrame = {
    val nm = graft.functions.BigramPplExpr(col(textCol),
      numMicro.toSeq, denMicro.toSeq)
    // mean in MICRO-nat space with explicit floor(x+0.5): -micro and n
    // are exact integers, their IEEE quotient is identical on every
    // engine, and half-up at the micro boundary avoids the round(x, 6)
    // half-tie split (Spark HALF_UP vs DuckDB) that the r10 sf0.1 check
    // caught on 3/5000 docs
    df.select(col(idCol), nm.getField("n").as("_n"), nm.getField("micro").as("_micro"))
      .select(col(idCol),
        when(col("_n") < 1, lit(0.0))
          .otherwise(floor(-col("_micro").cast("double")
            / col("_n").cast("double") + 0.5) / 1e6)
          .as("log_ppl"))
  }

  /** The composed CCNet bucketing: train on `targetPred`, score all, cut
    * head/middle/tail at the exact 1/3 and 2/3 score percentiles. */
  def pplBuckets(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int): DataFrame = {
    val (num, den) = bigramLogTables(df, textCol, targetPred, buckets)
    // lazy checkpoint: the percentile head() below materializes the
    // scored blocks, and the returned bucket projection reads them —
    // previously the full scoring pass (md5 per bigram, interpreted
    // HOFs) ran TWICE, once for the cuts and once for the output
    val scored = logPpl(df, idCol, textCol, num, den).localCheckpoint(false)
    val cuts = scored.agg(
      percentile(col("log_ppl"), lit(1.0 / 3)).as("c1"),
      percentile(col("log_ppl"), lit(2.0 / 3)).as("c2")).head()
    val (c1, c2) = (cuts.getDouble(0), cuts.getDouble(1))
    scored.select(col(idCol), col("log_ppl"),
      when(col("log_ppl") <= c1, "head")
        .when(col("log_ppl") <= c2, "middle")
        .otherwise("tail").as("bucket"))
  }
}
