package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines: symmetric
  * int8 scalar quantization (the storage/serving format ANN stacks ship
  * embeddings in — 4x smaller than float32, dequantizable on the fly)
  * and its inverse. Pure column expressions, narrow at any scale.
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
}
