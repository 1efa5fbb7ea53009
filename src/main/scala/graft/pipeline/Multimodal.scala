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
  * luminance histogram), the AUDIO path is real for the JDK-native
  * container formats (`javax.sound.sampled`, WAV/AIFF/AU PCM → amplitude
  * statistics + RMS histogram), and the VIDEO path is real for
  * Motion-JPEG in AVI (hand-rolled RIFF walk — the container is a public
  * format — + per-frame `javax.imageio` JPEG decode: [[decodeAviFrames]],
  * [[videoFeatures]], real [[sampleFrames]]). Payloads none of those
  * chains can open (e.g. H.264 — no JDK codec) fall back to the
  * clearly-marked deterministic STUB (`stubDecode`) — swapping in a
  * richer codec replaces only that one function.
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

  // ImageIO's default read path wraps every source in a DISK-backed
  // FileCacheImageInputStream — one temp file created+deleted per decode.
  // Our sources are in-memory byte arrays (Spark rows), so the cache file
  // is pure syscall overhead AND couples decode latency to tmp-dir state
  // (a filled or slow tmpdir from unrelated work shows up as a decode
  // "regression"). Memory-cached streams throughout.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** AVI container magic: `RIFF <size> AVI ` (the RIFF prefix alone is
    * ambiguous with WAV; the form type at offset 8 disambiguates —
    * dispatch is by the `kind` column anyway, this only gates parsing). */
  private def looksLikeAvi(b: Array[Byte]): Boolean = b.length >= 12 &&
    b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte && b(3) == 'F'.toByte &&
    b(8) == 'A'.toByte && b(9) == 'V'.toByte && b(10) == 'I'.toByte && b(11) == ' '.toByte

  /** REAL video decode for the one codec chain the JDK can finish:
    * Motion-JPEG in an AVI container. The RIFF/AVI layout is a public
    * format (chunks of `fourcc + uint32-LE size + body`, word-aligned;
    * frame data lives in the `movi` LIST — optionally grouped in
    * `rec ` sub-lists — as `NNdc`/`NNdb` chunks); each MJPEG frame body
    * is a standalone JPEG that `javax.imageio` opens. Returns the frame
    * JPEGs in stream order, or None when the payload is not a parseable
    * AVI or carries no JPEG frames (other codecs fall back to the
    * declared stub — their bodies don't start with the JPEG SOI marker).
    * Truncated containers yield the frames that fit, never an error. */
  def decodeAviFrames(media: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (!looksLikeAvi(media)) return None
    try {
      val frames = Seq.newBuilder[Array[Byte]]
      def fourcc(off: Int) = new String(media, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      def u32(off: Int): Long = java.nio.ByteBuffer.wrap(media, off, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        var ok = true
        while (ok && pos + 8 <= end) {
          val id = fourcc(pos)
          val size = u32(pos + 4)
          val body = pos + 8
          if (size > Int.MaxValue) ok = false
          else {
            val sz = size.toInt
            // a truncated LIST still yields the frames that fit inside
            // it; a truncated frame chunk is dropped (never a partial
            // JPEG), and the loop bound then ends the walk
            val bodyEnd = math.min(body.toLong + sz, end.toLong).toInt
            if (id == "LIST" && body + 4 <= bodyEnd) {
              val listType = fourcc(body)
              if (listType == "movi" || listType == "rec ") walk(body + 4, bodyEnd)
            } else if ((id.endsWith("dc") || id.endsWith("db")) && body + sz <= end) {
              // JPEG SOI (MJPG) or PNG signature (the MPNG/"PNG " codec —
              // lossless frames, which is what makes a clip-hash oracle
              // pixel-exact); other codecs' bodies match neither
              if (sz >= 2 && ((media(body) == 0xFF.toByte && media(body + 1) == 0xD8.toByte) ||
                  (media(body) == 0x89.toByte && media(body + 1) == 'P'.toByte)))
                frames += java.util.Arrays.copyOfRange(media, body, body + sz)
            }
            pos = body + sz + (sz & 1) // chunks are word-aligned
          }
        }
      }
      walk(12, math.min(8L + u32(4), media.length.toLong).toInt)
      val out = frames.result()
      if (out.isEmpty) None else Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode dispatch: real pixel/sample features for parseable image and
    * audio payloads; real per-frame pixel features (averaged over the
    * stream) for MJPEG-AVI video; deterministic stub for everything else
    * (non-MJPEG video codecs are not in the JDK). */
  def decode(kind: String, media: Array[Byte], dim: Int): Array[Float] = kind match {
    case "image" if looksLikeImage(media) =>
      decodeImage(media).map(imageFeatures(_, dim)).getOrElse(stubDecode(media, dim))
    case "audio" if looksLikeAudio(media) =>
      decodeAudio(media).map(audioFeatures(_, dim)).getOrElse(stubDecode(media, dim))
    case "video" if looksLikeAvi(media) =>
      videoFeatures(media, dim).getOrElse(stubDecode(media, dim))
    case _ => stubDecode(media, dim)
  }

  /** Mean of the per-frame [[imageFeatures]] over every decodable MJPEG
    * frame — the whole-clip summary a training pipeline keys on. */
  def videoFeatures(media: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeAviFrames(media).flatMap { frames =>
      val perFrame = frames.flatMap(f => decodeImage(f).map(imageFeatures(_, dim)))
      if (perFrame.isEmpty) None
      else {
        val out = new Array[Float](dim)
        perFrame.foreach { f =>
          var j = 0; while (j < dim) { out(j) += f(j); j += 1 }
        }
        var j = 0
        while (j < dim) { out(j) /= perFrame.size; j += 1 }
        Some(out)
      }
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

  /** Frame sampling: MJPEG-AVI payloads explode into REAL frames — every
    * `stride`-th frame's standalone JPEG bytes, `frame_idx` = position in
    * the stream (decodable downstream by [[decodeImage]]); payloads no
    * JDK codec chain opens keep the STUB slicing (every `stride`-th
    * 64-byte slice) so the explode shape is uniform. `mapPartitions`, no
    * shuffle, partitioning preserved. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 2): Dataset[MediaFrame] =
    media.filter(col("kind") === "video").mapPartitions(_.flatMap { r =>
      decodeAviFrames(r.media) match {
        case Some(frames) =>
          (0 until frames.size by stride).map(i => MediaFrame(r.doc_id, i, frames(i)))
        case None =>
          val frameSize = 64
          val n = math.max(r.media.length / frameSize, 1)
          (0 until n by stride).map { i =>
            val from = i * frameSize
            MediaFrame(r.doc_id, i,
              java.util.Arrays.copyOfRange(r.media, from, math.min(from + frameSize, r.media.length)))
          }
      }
    })(Encoders.product[MediaFrame])
}
