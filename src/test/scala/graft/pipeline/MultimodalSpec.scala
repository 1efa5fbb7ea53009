package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  private lazy val media = Multimodal.fromDocuments(docs)

  test("media table carries binary payload + typed metadata per kind") {
    val rows = media.collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      assert(Set("image", "audio", "video").contains(r.kind))
      assert(r.media.nonEmpty)
      if (r.kind == "audio") assert(r.sample_rate === 16000) else assert(r.sample_rate === 0)
    }
  }

  test("feature extraction is deterministic and batch-shaped (one pass per partition)") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.doc_id)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === 16))
    assert(f1.forall(_.features.forall(v => v >= -1f && v <= 1f)))
    // different payloads produce different features
    assert(f1.map(_.features.toSeq).distinct.length > 1)
  }

  test("mapPartitions stages preserve partitioning (no shuffle in the plan)") {
    val parts = media.rdd.getNumPartitions
    assert(Multimodal.extractFeatures(media).rdd.getNumPartitions === parts)
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("real PNG payloads decode to hand-computed pixel features") {
    // 2x2 PNG: black, white / red, blue
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, 0xFF000000)          // black
    img.setRGB(1, 0, 0xFFFFFFFF)          // white
    img.setRGB(0, 1, 0xFFFF0000)          // red
    img.setRGB(1, 1, 0xFF0000FF)          // blue
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val ds = Seq(Multimodal.MediaRecord(1L, "image", png, 2, 2, 0),
      Multimodal.MediaRecord(2L, "audio", png, 0, 0, 16000))
      .toDS()
    val out = Multimodal.extractFeatures(ds, dim = 16).collect().sortBy(_.doc_id)

    val f = out.head.features
    // means: R=(0+255+255+0)/4/255=0.5  G=255/4/255=0.25  B=(255+255)/4/255=0.5  A=1
    assert(math.abs(f(0) - 0.5f) < 1e-6); assert(math.abs(f(1) - 0.25f) < 1e-6)
    assert(math.abs(f(2) - 0.5f) < 1e-6); assert(math.abs(f(3) - 1.0f) < 1e-6)
    // 12-bin luma histogram: lumas 0,255,85,85 -> bins 0, 11, 3, 3
    val hist = f.drop(4)
    assert(math.abs(hist(0) - 0.25f) < 1e-6)
    assert(math.abs(hist(3) - 0.5f) < 1e-6)
    assert(math.abs(hist(11) - 0.25f) < 1e-6)
    assert(math.abs(hist.sum - 1.0f) < 1e-6)
    // audio kind ignores imageio and keeps the deterministic stub
    assert(out(1).features.toSeq === Multimodal.stubDecode(png, 16).toSeq)
  }

  test("TIFF payloads decode through the same real-pixel path (JDK ImageIO TIFF plugin)") {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF000000); img.setRGB(1, 0, 0xFFFFFFFF)
    img.setRGB(0, 1, 0xFFFF0000); img.setRGB(1, 1, 0xFF0000FF)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", baos), "JDK TIFF writer missing")
    val tiff = baos.toByteArray
    // II*\0 or MM\0* magic — the sniffer must admit it to the real path
    assert((tiff(0) == 'I' && tiff(1) == 'I') || (tiff(0) == 'M' && tiff(1) == 'M'))
    val ds = Seq(Multimodal.MediaRecord(1L, "image", tiff, 2, 2, 0)).toDS()
    val f = Multimodal.extractFeatures(ds, dim = 16).collect().head.features
    // same pixels as the PNG case: means R=0.5 G=0.25 B=0.5 (A=1 for RGB)
    assert(math.abs(f(0) - 0.5f) < 1e-6 && math.abs(f(1) - 0.25f) < 1e-6)
    assert(math.abs(f(2) - 0.5f) < 1e-6 && math.abs(f(3) - 1.0f) < 1e-6)
    // and NOT the stub (the sniffer really routed it to imageio)
    assert(f.toSeq !== Multimodal.stubDecode(tiff, 16).toSeq)
  }

  test("real WAV payloads decode to hand-computed sample features") {
    import javax.sound.sampled._
    // 4 mono 16-bit samples: +0.5, -0.5, 0, +0.25
    val pcm = Array[Byte](0x00, 0x40, 0x00, 0xC0.toByte, 0x00, 0x00, 0x00, 0x20)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 4)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)

    val ds = Seq(Multimodal.MediaRecord(1L, "audio", baos.toByteArray, 0, 0, 8000)).toDS()
    val f = Multimodal.extractFeatures(ds, dim = 16).head().features
    assert(math.abs(f(0) - 0.0625f) < 1e-6)            // mean
    assert(math.abs(f(1) - 0.375f) < 1e-6)             // RMS
    assert(math.abs(f(2) - 2f / 3f) < 1e-6)            // zero-crossing rate
    // 13-bin |amp| histogram: 0→bin0, 0.25→bin3, 0.5→bin6 (x2)
    val hist = f.drop(3)
    assert(math.abs(hist(0) - 0.25f) < 1e-6)
    assert(math.abs(hist(3) - 0.25f) < 1e-6)
    assert(math.abs(hist(6) - 0.5f) < 1e-6)
    assert(math.abs(hist.sum - 1.0f) < 1e-6)
  }

  test("unparseable image payloads fall back to the stub (query output stability)") {
    val junk = "not an image".getBytes("UTF-8")
    val ds = Seq(Multimodal.MediaRecord(9L, "image", junk, 4, 3, 0)).toDS()
    val out = Multimodal.extractFeatures(ds, dim = 16).head()
    assert(out.features.toSeq === Multimodal.stubDecode(junk, 16).toSeq)
  }

  test("resize rewrites payload size and metadata (stub path for synthetic payloads)") {
    val out = Multimodal.resize(media, 32, 32).collect()
    assert(out.forall(r => r.media.length === 32 * 32 && r.width === 32 && r.height === 32))
  }

  test("resize REALLY resamples decodable images (bilinear, PNG re-encode)") {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xFFFFFF)
    img.setRGB(0, 1, 0xFF0000); img.setRGB(1, 1, 0x0000FF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val ds = Seq(Multimodal.MediaRecord(1L, "image", baos.toByteArray, 2, 2, 0)).toDS()
    val out = Multimodal.resize(ds, 8, 6).head()
    assert(out.width === 8 && out.height === 6)
    val back = Multimodal.decodeImage(out.media)
    assert(back.isDefined, "resized payload must still be a decodable image")
    assert(back.get.getWidth === 8 && back.get.getHeight === 6)
    // determinism: the same input resizes to the same bytes
    val again = Multimodal.resize(ds, 8, 6).head()
    assert(java.util.Arrays.equals(out.media, again.media))
  }

  test("frame sampling explodes only video payloads with strided indices") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 === 0))
    val videoIds = media.filter($"kind" === "video").collect().map(_.doc_id).toSet
    assert(frames.map(_.doc_id).toSet.subsetOf(videoIds))
  }

  // ------------------------------------------------- MJPEG-AVI video path

  /** Solid-color JPEG via ImageIO — each AVI frame body is a standalone
    * JPEG, which is exactly what MJPEG stores. */
  private def jpegFrame(c: java.awt.Color, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(c); g.fillRect(0, 0, w, h) } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** RIFF chunk: fourcc + uint32-LE size + body, padded to even length. */
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("ISO-8859-1")).putInt(body.length).put(body)
    bb.array() // trailing pad byte (if any) stays zero
  }

  private def list(listType: String, parts: Array[Byte]*): Array[Byte] =
    chunk("LIST", listType.getBytes("ISO-8859-1") ++ parts.flatten)

  /** Minimal real-world-shaped MJPEG AVI: hdrl (avih + strl), a JUNK
    * chunk with an ODD size (exercises word-alignment), then movi with
    * one `00dc` chunk per frame. */
  private def mjpegAvi(frames: Seq[Array[Byte]], groupInRec: Boolean = false): Array[Byte] = {
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)),
      list("strl", chunk("strh", new Array[Byte](56)), chunk("strf", new Array[Byte](40))))
    val junk = chunk("JUNK", Array.fill(7)(0x7A.toByte))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val movi =
      if (groupInRec) list("movi", list("rec ", frameChunks: _*))
      else list("movi", frameChunks: _*)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ junk ++ movi
    chunk("RIFF", body)
  }

  test("MJPEG-AVI payloads decode into their real JPEG frames (RIFF walk)") {
    import java.awt.Color
    val avi = mjpegAvi(Seq(jpegFrame(Color.RED), jpegFrame(Color.GREEN),
      jpegFrame(Color.BLUE)))
    val frames = Multimodal.decodeAviFrames(avi).get
    assert(frames.size === 3)
    // every frame is a standalone decodable JPEG with the right color
    val rgb = frames.map { f =>
      val img = Multimodal.decodeImage(f).get
      val p = img.getRGB(4, 4)
      (((p >>> 16) & 0xFF), ((p >>> 8) & 0xFF), (p & 0xFF))
    }
    assert(rgb(0)._1 > 200 && rgb(0)._2 < 80 && rgb(0)._3 < 80, s"frame 0 not red: ${rgb(0)}")
    assert(rgb(1)._2 > 200, s"frame 1 not green: ${rgb(1)}")
    assert(rgb(2)._3 > 200, s"frame 2 not blue: ${rgb(2)}")
    // `rec `-grouped frames (the other layout real muxers emit) also parse
    assert(Multimodal.decodeAviFrames(
      mjpegAvi(Seq(jpegFrame(Color.RED)), groupInRec = true)).get.size === 1)
  }

  test("truncated AVI keeps the frames that fit; non-AVI yields None") {
    import java.awt.Color
    val avi = mjpegAvi(Seq(jpegFrame(Color.RED), jpegFrame(Color.BLUE)))
    // cut mid-way through the second frame's chunk: first frame survives
    val cut = java.util.Arrays.copyOf(avi, avi.length - 10)
    assert(Multimodal.decodeAviFrames(cut).get.size === 1)
    assert(Multimodal.decodeAviFrames("not an avi at all".getBytes).isEmpty)
    assert(Multimodal.decodeAviFrames(Array.emptyByteArray).isEmpty)
  }

  test("video decode is real for MJPEG-AVI (mean per-frame pixel features), stub otherwise") {
    import java.awt.Color
    val redAvi = mjpegAvi(Seq.fill(4)(jpegFrame(Color.RED)))
    val feats = Multimodal.decode("video", redAvi, dim = 8)
    // f0 = mean R (~1), f1/f2 = mean G/B (~0) — real pixels, not the stub
    assert(feats(0) > 0.9f && feats(1) < 0.2f && feats(2) < 0.2f,
      s"expected red-dominant features, got ${feats.toSeq}")
    assert(feats.toSeq !== Multimodal.stubDecode(redAvi, 8).toSeq)
    // a video payload no codec chain opens still takes the deterministic stub
    val opaque = "h264 bytes the JDK cannot open".getBytes
    assert(Multimodal.decode("video", opaque, 8).toSeq
      === Multimodal.stubDecode(opaque, 8).toSeq)
  }

  test("frame sampling explodes MJPEG-AVI into real strided JPEG frames") {
    import java.awt.Color
    val colors = Seq(Color.RED, Color.GREEN, Color.BLUE, Color.WHITE, Color.BLACK)
    val avi = mjpegAvi(colors.map(jpegFrame(_)))
    val rows = Seq((1L, "video", avi, 8, 8, 0),
      (2L, "image", jpegFrame(Color.RED), 8, 8, 0))
      .toDF("doc_id", "kind", "media", "width", "height", "sample_rate")
      .as(org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
    val frames = Multimodal.sampleFrames(rows, stride = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4)) // only the video row explodes
    // sampled frames are REAL standalone JPEGs carrying the source
    // colors: stride 2 over (RED, GREEN, BLUE, WHITE, BLACK) keeps
    // frames 0 = red, 2 = blue, 4 = black
    val rgb = frames.map { fr =>
      val img = Multimodal.decodeImage(fr.frame).get
      val p = img.getRGB(4, 4)
      (((p >>> 16) & 0xFF), ((p >>> 8) & 0xFF), (p & 0xFF))
    }
    assert(rgb(0)._1 > 200, s"frame 0 should be red, got ${rgb(0)}")
    assert(rgb(1)._3 > 200, s"frame 2 should be blue, got ${rgb(1)}")
    assert((rgb(2)._1 + rgb(2)._2 + rgb(2)._3) / 3 < 60, s"frame 4 should be black, got ${rgb(2)}")
  }
}
