package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.VideoHashExpr

/** Video near-duplicate detection — the last leg of the multimodal ×
  * dedup matrix (r12 verdict Next #2): per-frame dHash → temporal-
  * majority 64-bit clip hash ([[graft.functions.VideoHash]]) → the SAME
  * combination-banded Hamming mining machinery image and audio use
  * ([[ImageDedup.mine64]] — one machinery, three
  * modalities). Re-encoded / mildly-noised / few-frames-dropped copies
  * of one clip land within a few Hamming bits; distinct clips sit near
  * the 32-bit expectation.
  *
  * Scale shape: hashing is ONE narrow pass (container walk + per-frame
  * decode riding the scan — no frame explode, no shuffle); candidates
  * are a combination-banding equi-join (exact at the default radius). No all-pairs product at any scale.
  */
object VideoDedup {

  /** `(id, vhash)` for every decodable clip — the persistable artifact. */
  def hashFrame(videos: DataFrame, idCol: String, mediaCol: String): DataFrame =
    videos.select(col(idCol), VideoHashExpr(col(mediaCol)).as("vhash"))
      .filter(col("vhash").isNotNull)

  /** Near-duplicate clip pairs `(id_a, id_b, hamming)` via the shared
    * banding machinery. `hashed0` accepts the memoized artifact. */
  def videoNearDuplicates(videos: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 8, maxBucket: Int = 4096,
      logDroppedBuckets: Boolean = false,
      failOnCappedBuckets: Boolean = false,
      hashed0: Option[DataFrame] = None): DataFrame = {
    val hashed = hashed0.getOrElse(
      hashFrame(videos, idCol, mediaCol).localCheckpoint(true))
    ImageDedup.mine64(hashed, idCol, "vhash", maxHamming,
      maxBucket, logDroppedBuckets, failOnCappedBuckets, auditName = "video")
  }

  /** Per-frame hash frame `(id, frame_idx, fhash)` — one decode pass,
    * one row per decodable frame (undecodable frames drop, undecodable
    * clips contribute nothing). The input to PARTIAL-overlap mining:
    * clip-level hashes collapse whole-clip dups, frame sets catch
    * trimmed/edited copies. */
  def frameHashFrame(videos: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = videos.sparkSession
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_fid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("frame_idx", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("fhash", org.apache.spark.sql.types.LongType)))
    val rows = videos.select(col(idCol).cast("long"), col(mediaCol)).rdd.flatMap { r =>
      val id = r.getLong(0)
      Multimodal.decodeAviFrames(r.getAs[Array[Byte]](1)).toSeq.flatten
        .zipWithIndex.flatMap { case (fb, i) =>
          Option(graft.functions.ImageHash.dHash(fb)).map(h => Row(id, i, h.longValue()))
        }
    }
    spark.createDataFrame(rows, schema).withColumnRenamed("_fid", idCol)
  }

  /** Trimmed/partial-overlap clip pairs by FRAME-SET Jaccard over exact
    * per-frame hashes: `(id_a, id_b, shared, jaccard)` with
    * `jaccard >= minJaccard`. Candidates are an equi-join on the frame
    * hash itself (64-bit key — bucket population is the corpus's
    * per-frame duplication rate, not a banding artifact); shared/union
    * counts aggregate per pair. Distinct frame hashes per clip (a clip
    * repeating one frame counts it once — set semantics).
    *
    * Cap semantics (r13 verdict note 2): both the shared counts AND the
    * per-clip denominators come from the SAME capped frame set, so
    * `jaccard` is a true Jaccard of the sets actually mined — a binding
    * cap is pure candidate-frame recall loss, never a silently deflated
    * jaccard against full-size denominators. When the audit proves no
    * bucket overflows (or the cap never binds), capped == fset and the
    * result is the exact frame-set Jaccard. */
  def frameOverlapPairs(videos: DataFrame, idCol: String, mediaCol: String,
      minJaccard: Double = 0.5, maxBucket: Int = 4096,
      logDroppedBuckets: Boolean = true,
      failOnCappedBuckets: Boolean = false,
      frames0: Option[DataFrame] = None): DataFrame = {
    val fset = frames0.getOrElse(
        frameHashFrame(videos, idCol, mediaCol).localCheckpoint(true))
      .select(col(idCol), col("fhash")).dropDuplicates(idCol, "fhash")
    // strict mode audits inline (ImageDedup.auditedOrCapped's shape): the
    // per-hash count window rides the exchange the self-join needs — no
    // dedicated audit action per call
    val audited = ImageDedup.auditedOrCapped(fset, Seq("fhash"), idCol,
      maxBucket, logDroppedBuckets, failOnCappedBuckets, "video_frames")
    // r15 (the r14-verdict video_frame_overlap regression): the strict
    // audit never DROPS a row — an over-cap bucket throws — so `audited`
    // and `fset` hold identical rows whenever the query completes. The
    // counts and the probe join side therefore read the un-windowed
    // fset, and the count-window+assert rides ONE join side only (every
    // join shape fully consumes it: an SMJ sorts it, a BHJ either builds
    // from or streams it). The r14 shape put the window below all three
    // consumers and the executed plan computed the sort+window chain 2–3
    // times (AQE stage reuse shares the exchange, not the window above
    // it). Non-strict mode is untouched: a binding cap really drops
    // rows, so every consumer must read the capped frame.
    val base = if (failOnCappedBuckets) fset else audited
    val counts = base.groupBy(col(idCol)).agg(count(lit(1)).as("_n"))
    val shared = audited.select(col("fhash"), col(idCol).as("id_a"))
      .join(base.select(col("fhash"), col(idCol).as("id_b")), Seq("fhash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    shared
      .join(counts.select(col(idCol).as("id_a"), col("_n").as("_na")), Seq("id_a"))
      .join(counts.select(col(idCol).as("id_b"), col("_n").as("_nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("shared"),
        round(col("shared").cast("double") /
          (col("_na") + col("_nb") - col("shared")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  // ---------------------------------------------------------- fixture

  /** Frames per fixture clip (odd majority thresholds at 2·cnt > 4 ⇒
    * a bit needs 3 of 4 frames). */
  val FixtureFrames = 4

  /** Grayscale value of pixel `(x, y)` of frame `f` of clip `id`: ids
    * with `id % plantEvery == 1` are PLANTED near-duplicates of `id − 1`
    * — same md5-derived base frames plus a ±1 perturbation on ~20% of
    * pixels per frame (the re-encode/noise regime); ids with
    * `id % plantEvery == 26` are PLANTED TRIMMED COPIES of `id − 1` —
    * frames 0..2 are that clip's frames BIT-EXACTLY (the edit/trim dup
    * mode, where shared frames are identical but the clips differ),
    * frame 3 is their own. Exactly replayable in SQL (the
    * [[ImageDedup.pixel]] discipline, per frame). */
  def vpixel(id: Long, plantEvery: Int, f: Int, x: Int, y: Int): Int = {
    val planted = plantEvery > 0 && id % plantEvery == 1
    val trimmed = plantEvery > 0 && id % plantEvery == 26 && f < 3
    val seed = if (planted || trimmed) id - 1 else id
    val v = ImageDedup.md5Byte(s"vid:$seed:$f:$x:$y")
    if (!planted) v
    else {
      val d = ImageDedup.md5Byte(s"vpert:$id:$f:$x:$y") % 10 match {
        case 0 => 1
        case 1 => -1
        case _ => 0
      }
      math.max(0, math.min(255, v + d))
    }
  }

  /** One lossless PNG frame of the fixture clip. */
  def makeFramePng(id: Long, plantEvery: Int, f: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = vpixel(id, plantEvery, f, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A REAL RIFF/AVI container around the fixture's PNG frames (the
    * MPNG codec layout — lossless, so decoded pixels equal authored
    * pixels and the oracle replays the hash without decoding):
    * `RIFF(AVI ) { LIST(movi) { 00dc(frame)… } }`, chunks word-aligned. */
  def makeAvi(id: Long, plantEvery: Int, frames: Int, w: Int, h: Int): Array[Byte] = {
    val frameBytes = (0 until frames).map(f => makeFramePng(id, plantEvery, f, w, h))
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
      bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF)
    }
    def fourcc(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val moviBody = 4 + frameBytes.map(fb => 8 + fb.length + (fb.length & 1)).sum
    val riffBody = 4 + 8 + moviBody // "AVI " + LIST header + movi list
    fourcc("RIFF"); w32(riffBody); fourcc("AVI ")
    fourcc("LIST"); w32(moviBody); fourcc("movi")
    frameBytes.foreach { fb =>
      fourcc("00dc"); w32(fb.length); bos.write(fb)
      if ((fb.length & 1) == 1) bos.write(0) // word alignment pad
    }
    bos.toByteArray
  }

  /** Deterministic clip table derived from a document frame: one
    * 4-frame 27×16 MPNG-AVI per id (the image fixture's exact-block
    * geometry, per frame). Narrow map, no shuffle. */
  def videoTable(docs: DataFrame, idCol: String = "doc_id",
      plantEvery: Int = 50, frames: Int = FixtureFrames,
      w: Int = 27, h: Int = 16): DataFrame = {
    val ids = docs.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    ids.mapPartitions(_.map(id => (id, makeAvi(id, plantEvery, frames, w, h))))(
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "media")
  }
}
