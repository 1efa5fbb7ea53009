package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.ops.Knn

/** Embedding-column utilities for training-data pipelines: symmetric
  * int8 scalar quantization (the storage/serving format ANN stacks ship
  * embeddings in — 4x smaller than float32, dequantizable on the fly)
  * and its inverse, plus hard-negative mining for contrastive training.
  * Quantization is pure column expressions, narrow at any scale.
  *
  * Engine parity: quantization uses `floor(x/scale*127 + 0.5)` — an
  * explicit round-half-up on exactly-representable IEEE intermediates —
  * instead of either engine's `round`, so a SQL oracle reproduces every
  * code byte-for-byte from the same float32 input.
  */
object EmbeddingOps {

  /** Per-vector symmetric scale: max |x_i| as double (exact for float32
    * input). Zero vectors quantize to all-zero codes with scale 0. */
  def quantScale(vecCol: Column): Column =
    coalesce(array_max(transform(vecCol, x => abs(x.cast("double")))), lit(0.0))

  /** Int8 codes: `floor(x/scale*127 + 0.5)` per element, [-127, 127]. */
  def quantizeInt8(vecCol: Column): Column = {
    val s = quantScale(vecCol)
    when(s === 0.0, transform(vecCol, _ => lit(0)))
      .otherwise(transform(vecCol,
        x => floor(x.cast("double") / s * 127.0 + 0.5).cast("int")))
  }

  /** Dequantized doubles: `code * scale / 127` per element. */
  def dequantizeInt8(codesCol: Column, scaleCol: Column): Column =
    transform(codesCol, c => c.cast("double") * scaleCol / 127.0)

  /** Max absolute reconstruction error of one round trip, rounded to 6
    * decimals — the quality gauge a compression pass reports. */
  def quantError(vecCol: Column): Column = {
    val deq = dequantizeInt8(quantizeInt8(vecCol), quantScale(vecCol))
    round(coalesce(array_max(zip_with(vecCol, deq,
      (x, d) => abs(x.cast("double") - d))), lit(0.0)), 6)
  }

  /** Hard-negative mining for contrastive/embedding training (the DPR /
    * sentence-transformers prep step): for every query vector, the k
    * NEAREST corpus vectors farther than `minDist` — close enough to be
    * confusable (hard), far enough to be presumed non-duplicates
    * (negative; `dist > minDist` excludes the query's own row, exact
    * copies, and near-dup positives in one band).
    *
    * Scale shape: the query set broadcasts (an eval/anchor set is small
    * by construction); the corpus is scanned ONCE with a codegen
    * distance, the exclusion band filters BEFORE aggregation, and
    * per-query top-k runs as the partial-aggregable bounded heap
    * ([[graft.ops.Knn.batchOver]]) — the only shuffle is the
    * O(#queries × k) combine, never the corpus.
    *
    * Returns (query_id, rank BIGINT, id, dist), nearest-first with the
    * (dist, id) deterministic tie-break. */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int = 10, minDist: Double = 0.05,
      metric: String = "cosine_distance"): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qVecCol))))
      .withColumn("dist", round(Distances.metric(metric)(col(vecCol), col(qVecCol)), 6))
      .filter(col("dist") > minDist)
    Knn.batchOver(scored, idCol, qIdCol, k)
  }
}
