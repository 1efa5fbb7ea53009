package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines (build-brief
  * extension): media payloads as opaque BINARY columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * operators as `mapPartitions` stages.
  *
  * The Spark-side plumbing — schema, encoders, per-partition batch shape,
  * partition preservation — is real and tested. The IMAGE decode path is
  * real (JDK `javax.imageio`, PNG/JPEG/GIF/BMP/TIFF → pixel statistics +
  * luminance histogram), and the AUDIO path is real for the JDK-native
  * container formats (`javax.sound.sampled`, WAV/AIFF/AU PCM → amplitude
  * statistics + RMS histogram). Payloads neither stack can parse, and the
  * video kind (no codec in the JDK), fall back to the clearly-marked
  * deterministic STUB (`stubDecode`) — swapping in a richer codec
  * replaces only that one function.
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

  /** STUB decode — the declared fallback for payloads no JDK codec opens
    * (video always; image/audio when the container is exotic or corrupt).
    * Deterministic: feature j folds every payload byte with a
    * per-dimension multiplier, normalized to [-1, 1].
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

  /** Real image decode: PNG/JPEG/GIF/BMP/TIFF payload → pixels via the JDK's
    * `javax.imageio` (None when the bytes are not a parseable image). */
  def decodeImage(media: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Pixel features of a decoded image, `dim ≥ 5` floats in [0, 1]:
    *   f0..f3  mean R, G, B, A over all pixels (/255);
    *   f4..    `dim-4`-bin luminance histogram (integer luma = (r+g+b)/3,
    *           bin = luma·nbins/256 clamped, normalized by pixel count).
    */
  def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    require(dim >= 5, s"image feature dim must be >= 5, got $dim")
    val w = img.getWidth; val h = img.getHeight
    val nbins = dim - 4
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    val bins = new Array[Long](nbins)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        val a = (argb >>> 24) & 0xFF; val r = (argb >>> 16) & 0xFF
        val g = (argb >>> 8) & 0xFF; val b = argb & 0xFF
        sr += r; sg += g; sb += b; sa += a
        val luma = (r + g + b) / 3
        bins(math.min(luma * nbins / 256, nbins - 1)) += 1
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    val out = new Array[Float](dim)
    out(0) = sr / n / 255f; out(1) = sg / n / 255f
    out(2) = sb / n / 255f; out(3) = sa / n / 255f
    var j = 0
    while (j < nbins) { out(4 + j) = bins(j) / n; j += 1 }
    out
  }

  /** Real audio decode: WAV/AIFF/AU payload → 16-bit PCM samples
    * normalized to [-1, 1] (None when the bytes are not a parseable
    * JDK-native audio container). */
  def decodeAudio(media: Array[Byte]): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(media)))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Float](n)
          val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN
          val buf = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
          var i = 0
          while (i < n) { out(i) = buf.get(i) / 32768f; i += 1 }
          Some(out)
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Sample features of decoded audio, `dim ≥ 3` floats:
    *   f0  mean amplitude; f1 RMS; f2 zero-crossing rate;
    *   f3.. `dim-3`-bin |amplitude| histogram (bin = |a|·nbins clamped,
    *        normalized by sample count).
    */
  def audioFeatures(samples: Array[Float], dim: Int): Array[Float] = {
    require(dim >= 3, s"audio feature dim must be >= 3, got $dim")
    val n = samples.length
    if (n == 0) return new Array[Float](dim)
    val nbins = dim - 3
    var sum = 0.0; var sq = 0.0; var zc = 0
    val bins = new Array[Long](math.max(nbins, 1))
    var i = 0
    while (i < n) {
      val a = samples(i)
      sum += a; sq += a.toDouble * a
      if (i > 0 && (samples(i - 1) >= 0) != (a >= 0)) zc += 1
      if (nbins > 0) bins(math.min((math.abs(a) * nbins).toInt, nbins - 1)) += 1
      i += 1
    }
    val out = new Array[Float](dim)
    out(0) = (sum / n).toFloat
    out(1) = math.sqrt(sq / n).toFloat
    out(2) = if (n > 1) zc.toFloat / (n - 1) else 0f
    var j = 0
    while (j < nbins) { out(3 + j) = bins(j).toFloat / n; j += 1 }
    out
  }

  /** Container magic bytes the JDK stacks can actually open — a byte
    * check gates the (exception-driven, reader-probing) codec attempts so
    * non-media payloads cost nothing extra on the hot path. */
  private def looksLikeImage(b: Array[Byte]): Boolean = b.length >= 4 && (
    (b(0) == 0x89.toByte && b(1) == 'P'.toByte) ||                  // PNG
    (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||                 // JPEG
    (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte) || // GIF
    (b(0) == 'B'.toByte && b(1) == 'M'.toByte) ||                   // BMP
    // TIFF (JDK 9+ ships an ImageIO TIFF plugin): II*\0 or MM\0*
    (b(0) == 'I'.toByte && b(1) == 'I'.toByte && b(2) == 42 && b(3) == 0) ||
    (b(0) == 'M'.toByte && b(1) == 'M'.toByte && b(2) == 0 && b(3) == 42))

  private def looksLikeAudio(b: Array[Byte]): Boolean = b.length >= 4 && (
    (b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte && b(3) == 'F'.toByte) || // WAV
    (b(0) == 'F'.toByte && b(1) == 'O'.toByte && b(2) == 'R'.toByte && b(3) == 'M'.toByte) || // AIFF
    (b(0) == '.'.toByte && b(1) == 's'.toByte && b(2) == 'n'.toByte && b(3) == 'd'.toByte))   // AU

  /** Decode dispatch: real pixel/sample features for parseable image and
    * audio payloads, deterministic stub for everything else (video codecs
    * are not in the JDK). */
  def decode(kind: String, media: Array[Byte], dim: Int): Array[Float] = kind match {
    case "image" if looksLikeImage(media) =>
      decodeImage(media).map(imageFeatures(_, dim)).getOrElse(stubDecode(media, dim))
    case "audio" if looksLikeAudio(media) =>
      decodeAudio(media).map(audioFeatures(_, dim)).getOrElse(stubDecode(media, dim))
    case _ => stubDecode(media, dim)
  }

  /** Feature extraction as a partition-wise batch stage: one iterator pass
    * per partition (the shape a Pandas-UDF/mapInPandas stage has), no
    * shuffle, partitioning preserved. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] =
    media.mapPartitions(_.map(r =>
      MediaFeatures(r.doc_id, r.kind, decode(r.kind, r.media, dim))))(
      Encoders.product[MediaFeatures])

  /** Resize: payloads that decode as real images (PNG/JPEG/GIF/BMP/TIFF magic
    * + imageio) are ACTUALLY resampled — Java2D bilinear draw into a
    * w×h RGB canvas, re-encoded as PNG (deterministic for a given JDK);
    * everything else keeps the stub plumbing (truncate/pad to the target
    * pixel count) so the batch shape is uniform. Runs mapPartitions, no
    * shuffle, partitioning preserved. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] =
    media.mapPartitions(_.map { r =>
      decodeImage(r.media) match {
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          r.copy(media = bos.toByteArray, width = w, height = h)
        case None =>
          val resized = java.util.Arrays.copyOf(r.media, w * h)
          r.copy(media = resized, width = w, height = h)
      }
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
