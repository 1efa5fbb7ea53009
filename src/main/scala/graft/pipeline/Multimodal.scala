package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines (build-brief
  * extension): media payloads as opaque BINARY columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * operators as `mapPartitions` stages.
  *
  * The Spark-side plumbing — schema, encoders, per-partition batch shape,
  * partition preservation — is real and tested. The DECODE step is a
  * clearly-marked STUB (`stubDecode`): real image/audio codecs are not in
  * this container, so a deterministic byte-derived feature stands in;
  * swapping in a real codec only replaces that one function.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte],
      width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(doc_id: Long, kind: String, features: Array[Float])
  case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic media table derived from documents: payload = UTF-8
    * bytes, kind/shape metadata by id. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    docs.select(
      col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      col("text").cast("binary").as("media"),
      (col("doc_id") % 64 + 16).cast("int").as("width"),
      (col("doc_id") % 48 + 16).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).as("sample_rate"))
      .as(Encoders.product[MediaRecord])
  }

  /** STUB decode — stands in for a real image/audio codec (??? in spirit:
    * the bytes→pixels/samples step). Deterministic: feature j folds every
    * payload byte with a per-dimension multiplier, normalized to [-1, 1].
    */
  def stubDecode(media: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      var acc = 1125899906842597L // FNV-ish fold, per-dimension offset
      var i = 0
      while (i < media.length) { acc = acc * 31 + media(i) * (j + 7); i += 1 }
      out(j) = ((acc & 0xFFFF).toFloat / 32768f) - 1f
      j += 1
    }
    out
  }

  /** Feature extraction as a partition-wise batch stage: one iterator pass
    * per partition (the shape a Pandas-UDF/mapInPandas stage has), no
    * shuffle, partitioning preserved. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] =
    media.mapPartitions(_.map(r =>
      MediaFeatures(r.doc_id, r.kind, stubDecode(r.media, dim))))(
      Encoders.product[MediaFeatures])

  /** STUB resize: truncates/pads the payload to the target pixel count and
    * rewrites the metadata — the plumbing of a real resize. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] =
    media.mapPartitions(_.map { r =>
      val target = w * h
      val resized = java.util.Arrays.copyOf(r.media, target)
      r.copy(media = resized, width = w, height = h)
    })(Encoders.product[MediaRecord])

  /** STUB frame sampling: every `stride`-th 64-byte slice of the payload
    * becomes a "frame" row — the explode shape of real video sampling. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 2): Dataset[MediaFrame] =
    media.filter(col("kind") === "video").mapPartitions(_.flatMap { r =>
      val frameSize = 64
      val n = math.max(r.media.length / frameSize, 1)
      (0 until n by stride).map { i =>
        val from = i * frameSize
        MediaFrame(r.doc_id, i,
          java.util.Arrays.copyOfRange(r.media, from, math.min(from + frameSize, r.media.length)))
      }
    })(Encoders.product[MediaFrame])
}
