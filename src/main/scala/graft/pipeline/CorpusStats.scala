package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus accounting and distribution-based filtering — the bookkeeping
  * passes a data-curation run starts and ends with: how many documents
  * and tokens each source contributes (mixing weights are set from
  * exactly this table) and which documents sit inside their language's
  * typical length band (a standard C4/CCNet-family quality cut).
  */
object CorpusStats {

  /** Per-source corpus accounting: document count, whitespace-token
    * count, distinct-content count, and the implied duplicate rate.
    *
    * Scale shape: ONE hash-partitioned aggregate over the (small)
    * source key space; `countDistinct` expands to Spark's standard
    * two-phase plan whose first phase dedups `(source, hash)` map-side,
    * so the shuffle carries one row per distinct content per source,
    * never the corpus. */
  def sourceStats(df: DataFrame, srcCol: String, textCol: String): DataFrame =
    df.groupBy(col(srcCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col(textCol))).as("n_tokens"),
        countDistinct(md5(col(textCol).cast("binary"))).as("n_unique"))
      .select(col(srcCol), col("n_docs"), col("n_tokens"), col("n_unique"),
        round(lit(1.0) -
          col("n_unique").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"))

  /** Per-language length-band filter: keep documents whose `lenCol`
    * falls inside the `[pLo, pHi]` EXACT-percentile band of their own
    * language's length distribution (per-group, not global — a 50-char
    * document is normal in one language's crawl and an outlier in
    * another's).
    *
    * Two passes, no window: pass 1 is one aggregate over the tiny
    * language key space (exact interpolated percentiles — both engines
    * use the `(n−1)·p` linear-interpolation definition); pass 2
    * broadcast-joins the bounds back and filters narrowly. Bounds are
    * frozen to 6dp so the band edges are engine-exact; they ride along
    * in the output to pin the percentile computation itself. */
  def langLengthFilter(df: DataFrame, langCol: String, lenCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(0.0 <= pLo && pLo <= pHi && pHi <= 1.0,
      s"need 0 <= pLo <= pHi <= 1, got $pLo, $pHi")
    val bounds = df.groupBy(col(langCol)).agg(
      round(percentile(col(lenCol), lit(pLo)), 6).as("lo"),
      round(percentile(col(lenCol), lit(pHi)), 6).as("hi"))
    df.join(broadcast(bounds), langCol)
      .filter(col(lenCol).cast("double") >= col("lo") &&
        col(lenCol).cast("double") <= col("hi"))
  }
}
