package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) over hashed unigram features — score every raw
  * document by how target-like its token distribution is, then keep the
  * highest-scoring slice. The published estimator:
  *
  *   score(doc) = Σ_tokens log p̂_target(bucket(tok)) − log p̂_raw(bucket(tok))
  *
  * with Laplace-smoothed bucket probabilities over a fixed hashed
  * feature space.
  *
  * Scale shape: the feature space is a FIXED number of buckets, so the
  * weight-estimation pass is one exploded token scan whose shuffle
  * collapses to `buckets` keys under map-side partial aggregation; the
  * learned weights are a bounded driver-side array broadcast into a
  * narrow per-document scoring map (no join, no second shuffle). The
  * top-k cut plans as `TakeOrderedAndProject`. At 100 TB the token scan
  * is the only corpus-wide work and it carries no document ids.
  *
  * Engine parity: buckets come from an md5 hex prefix (stable across
  * engines, same trick as [[CorpusSampling]]'s salted fractions), and
  * per-bucket log-ratios are frozen to integer MICRO-nats before any
  * per-document summation — document scores are exact integer sums in
  * any order, so a SQL oracle lands on identical hashes regardless of
  * either engine's float summation order.
  */
object Dsir {

  /** Engine-stable hashed feature id in [0, buckets): the first 4 hex
    * chars of md5 parsed as an integer. SQL replay:
    * `CAST(('0x' || substring(md5(tok),1,4)) AS BIGINT) % buckets`. */
  def bucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("long") % buckets

  /** Laplace-smoothed importance log-ratio per bucket, in micro-nats
    * (`round(1e6 * (ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))))`), for ALL
    * `buckets` ids including empty ones. Executed as one exploded token
    * scan with a `buckets`-key aggregate; the result is bounded by
    * construction (`buckets` rows) so the driver-side collect in
    * [[importanceScores]] is safe at any corpus size. */
  def featureLogRatios(df: DataFrame, textCol: String, targetPred: Column,
      buckets: Int): Array[Long] = {
    val counts = df
      // two steps: a generator and a struct-field extraction in ONE
      // projection trips ExtractGenerator's rebuild (field names degrade
      // to col1..colN), so the predicate resolves before the explode
      .select(targetPred.as("is_target"), col(textCol))
      .select(col("is_target"), explode(Dedup.tokens(col(textCol))).as("tok"))
      .select(col("is_target"), bucket(col("tok"), buckets).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("raw"),
        count(when(col("is_target"), 1)).as("tgt"))
      .collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2))).toMap
    val rawTotal = counts.valuesIterator.map(_._1).sum
    val tgtTotal = counts.valuesIterator.map(_._2).sum
    Array.tabulate(buckets) { b =>
      val (raw, tgt) = counts.getOrElse(b, (0L, 0L))
      val w = math.log((tgt + 1).toDouble / (tgtTotal + buckets)) -
        math.log((raw + 1).toDouble / (rawTotal + buckets))
      // explicit round-half-up: `floor(x + 0.5)` has identical semantics
      // in Scala and DuckDB SQL, unlike rint (half-even) vs round
      // (half-away-from-zero)
      math.floor(w * 1e6 + 0.5).toLong
    }
  }

  /** Exact integer micro-nat importance score as a COLUMN — the narrow
    * reusable form (gates should compare the integer, not the rounded
    * double, so `micro >= 0` has no −0.0 edge). One codegen pass
    * ([[graft.functions.MicroSumExpr]], r14) — the previous
    * `aggregate` HOF form was CodegenFallback and ran the scoring scan
    * interpreted with an md5 per token per reference. Identical
    * semantics incl. NULL propagation. */
  def microScore(textCol: Column, weightsMicro: Array[Long]): Column =
    graft.functions.MicroSumExpr(textCol, weightsMicro.toSeq)

  /** Per-document importance scores (in nats, micro-rounded) against a
    * frozen weight array: a pure narrow map — each token hashes into the
    * broadcast-literal weight table and the integer micro-nats sum
    * exactly. */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
      weightsMicro: Array[Long]): DataFrame =
    df.select(col(idCol),
      round(microScore(col(textCol), weightsMicro).cast("double") / 1e6, 6)
        .as("dsir_score"))

  /** The composed selector: estimate weights from `targetPred`, score
    * every document, keep the top `k` by (score desc, id asc) — the
    * deterministic-cut variant of DSIR's Gumbel-resampling step. */
  def selectTopK(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int, k: Int): DataFrame = {
    val weights = featureLogRatios(df, textCol, targetPred, buckets)
    importanceScores(df, idCol, textCol, weights)
      .orderBy(col("dsir_score").desc, col(idCol).asc)
      .limit(k)
  }
}
