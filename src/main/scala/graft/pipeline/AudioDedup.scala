package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.AudioHashExpr

/** Audio near-duplicate detection — the audio leg of the multimodal ×
  * dedup matrix: perceptual envelope hash per clip
  * ([[graft.functions.AudioHash]]) + the SAME combination-banded Hamming
  * banding the image miner uses
  * ([[ImageDedup.mine64]] — one machinery, two
  * modalities). Re-encoded/noised copies of one recording land within a
  * few Hamming bits; unrelated clips sit near the 32-bit expectation.
  *
  * The gate fixture is a deterministic REAL-WAV table derived from
  * `documents`: every 16-bit PCM sample is md5-derived and WAV is
  * lossless, so the DuckDB oracle regenerates the exact sample stream
  * and replays |amplitude| → 65-block envelope → hash bits → banding →
  * Hamming without decoding anything — the `javax.sound` decode path is
  * covered end-to-end by the hash-match. Ids with `id % 50 == 1` are
  * planted near-duplicates of `id − 1` (±16/32768 noise on ~20% of
  * samples — the re-encode/noise regime).
  */
object AudioDedup {

  /** `(id, ahash)` for every decodable clip — the persistable artifact. */
  def hashFrame(clips: DataFrame, idCol: String, mediaCol: String): DataFrame =
    clips.select(col(idCol), AudioHashExpr(col(mediaCol)).as("ahash"))
      .filter(col("ahash").isNotNull)

  /** Near-duplicate clip pairs `(id_a, id_b, hamming)`. */
  def audioNearDuplicates(clips: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 8, maxBucket: Int = 4096,
      logDroppedBuckets: Boolean = false,
      failOnCappedBuckets: Boolean = false,
      hashed0: Option[DataFrame] = None): DataFrame = {
    val hashed = hashed0.getOrElse(
      hashFrame(clips, idCol, mediaCol).localCheckpoint(true))
    ImageDedup.mine64(hashed, idCol, "ahash", maxHamming,
      maxBucket, logDroppedBuckets, failOnCappedBuckets, auditName = "audio")
  }

  // ---------------------------------------------------------- fixture

  /** Signed 16-bit sample `i` of clip `id` in the deterministic fixture:
    * first 4 md5 hex chars as 0..65535, two's complement; planted ids
    * perturb the base clip's samples by ±16 on ~20% of positions. The
    * DuckDB idiom: `u = CAST(('0x' || substring(md5(s), 1, 4)) AS BIGINT)`,
    * `CASE WHEN u >= 32768 THEN u - 65536 ELSE u END`. */
  def sample(id: Long, plantEvery: Int, i: Int): Int = {
    val planted = plantEvery > 0 && id % plantEvery == 1
    val seed = if (planted) id - 1 else id
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"aud:$seed:$i".getBytes("UTF-8"))
    val u = ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
    val s = if (u >= 32768) u - 65536 else u
    if (!planted) s
    else {
      val pd = ImageDedup.md5Byte(s"apert:$id:$i") % 10 match {
        case 0 => 16
        case 1 => -16
        case _ => 0
      }
      math.max(-32768, math.min(32767, s + pd))
    }
  }

  /** One REAL WAV (RIFF PCM16LE mono, 16 kHz — lossless) per id. */
  def makeWav(id: Long, plantEvery: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(16000).putInt(16000 * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort(sample(id, plantEvery, i).toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic clip table derived from a document frame: one
    * 520-sample WAV per id (520 = 65 envelope blocks × 8 samples —
    * exact 8-sample blocks, so the oracle's block means are plain
    * integer averages). Narrow map, no shuffle. */
  def audioTable(docs: DataFrame, idCol: String = "doc_id",
      plantEvery: Int = 50, nSamples: Int = 520): DataFrame = {
    val ids = docs.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    ids.mapPartitions(_.map(id => (id, makeWav(id, plantEvery, nSamples))))(
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "media")
  }
}
