package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.DHashExpr

/** Image near-duplicate detection (build-brief multimodal × dedup
  * extension; r11 verdict item 3): perceptual dHash per image
  * ([[graft.functions.ImageHash]]) + the SimHash banding machinery —
  * combination-banded candidates, exact packed-Hamming verify,
  * capped buckets with drop telemetry. A real 100 TB multimodal corpus
  * dedups images as surely as text: re-encoded, resized and
  * mildly-noised copies of one picture land within a few Hamming bits
  * of each other while unrelated images sit near the 32-bit expectation.
  *
  * Scale shape: hashing is ONE narrow pass (decode riding the scan);
  * the candidate join is equi-join only. The DEFAULT miner is
  * combination banding ([[mine64]] → [[hamming64NearDuplicatesCombo]],
  * Manku WWW'07): pigeonhole-COMPLETE at the default verify radius, so
  * the mined pairs are the EXACT Hamming-≤-8 graph, with ~13-bit band
  * keys (bucket population N/2^13). Single-word banding remains for
  * wider radii and as the measured-recall alternative
  * ([[hamming64NearDuplicates]], `band_recall` gate). No all-pairs
  * product at any scale.
  * Exact-duplicate media should be collapsed by the exact-dedup pass
  * first (identical bytes → identical hash → Hamming 0 survives here
  * too, but pays the banding join for rows a groupBy would collapse).
  */
object ImageDedup {

  /** `(id, dhash)` for every decodable image — the persistable artifact
    * (build once, mine many). Undecodable payloads drop here. */
  def hashFrame(images: DataFrame, idCol: String, mediaCol: String): DataFrame =
    images.select(col(idCol), DHashExpr(col(mediaCol)).as("dhash"))
      .filter(col("dhash").isNotNull)

  /** Word-banded Hamming mining over ANY 64-bit perceptual hash column
    * — shared by the image (dHash), audio (envelope hash) and video
    * (clip hash) miners: candidates share ≥ 1 of the `64/bandBits`
    * words, verified by exact packed Hamming ≤ `maxHamming`.
    *
    * Pigeonhole: a pair at Hamming h is GUARANTEED found when
    * h < 64/bandBits. The default `bandBits = 8` (8 words) is therefore
    * complete for Hamming ≤ 7 — covering the default `maxHamming = 8`
    * to within one bit; at exactly 8 a pair escapes only when all 8
    * words carry a flip (adversarially measured by the `band_recall`
    * gate's distinct-word plants). `bandBits = 16` (4 words, complete
    * ≤ 3) is the very-large-corpus setting: bucket population scales
    * as N/2^bandBits, so at billions of rows the wider word keeps
    * buckets bounded at the price of recall in the 4..maxHamming band —
    * the Manku WWW'07 block-permutation trade, with the recall gate and
    * the strict cap audit as the two honest guards.
    * `failOnCappedBuckets = true` is for callers whose output is held
    * to an oracle that replays no cap (the strict-audit pattern — a
    * binding cap fails loudly at mining time, never as a mystery
    * hash-mismatch in a new regime). */
  def hamming64NearDuplicates(hashed: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, maxBucket: Int,
      logDroppedBuckets: Boolean, failOnCappedBuckets: Boolean,
      auditName: String, bandBits: Int = 8): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val banded = bandRows(hashed, idCol, hashCol, bandBits)
    val capped = auditedOrCapped(banded, Seq("word", "bucket"), idCol,
      maxBucket, logDroppedBuckets, failOnCappedBuckets, auditName)
    val left = capped.select(col("word"), col("bucket"),
      col(idCol).as("id_a"), col(hashCol).as("ha"))
    val right = capped.select(col("word"), col("bucket"),
      col(idCol).as("id_b"), col(hashCol).as("hb"))
    // Hamming-verify BEFORE the pair-dedup shuffle (guide §2.3 "shuffle
    // fewer bytes"): hamming is a pure function of the pair's two hashes,
    // so every banded copy of a pair carries the identical value and
    // filtering first changes nothing — but the dropDuplicates exchange
    // now moves only ≤-radius pairs instead of every band collision
    // (the overwhelming majority at corpus scale is far outside the
    // radius). Catalyst cannot push this itself: the filter sits above
    // an aggregate-kept value, not a grouping key.
    left.join(right, Seq("word", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Strict-audit / cap dispatch for the Hamming miners. Strict mode
    * (`failOnCappedBuckets`) no longer runs a dedicated audit ACTION
    * before mining (r14): the per-bucket count rides the SAME
    * exchange+sort the candidate self-join needs (a count window over
    * the join keys), and an anchored `assert_true` turns any bucket
    * over `maxBucket` into the same loud mining-time failure — one
    * driver action saved per strict mining call, zero extra shuffles.
    * Non-strict callers keep the audited-skip / row_number-cap path
    * unchanged (the cap needs the full per-bucket ranking anyway).
    *
    * Strict-mode contract (r14 advice note): the failure is guaranteed
    * only when the mining output is actually CONSUMED — a
    * short-circuiting consumer (limit / isEmpty / a pruned broadcast
    * build side) can complete without evaluating the overflowing
    * bucket's rows, where the pre-r14 dedicated audit always threw; and
    * the error surfaces as a SparkException-wrapped `raise_error`, not
    * a driver-side IllegalStateException. Every declared strict caller
    * (the oracle-gated miners) consumes its full output, so the
    * declared keys keep the unconditional guarantee; callers needing an
    * unconditional audit on a short-circuiting consumer should run
    * [[graft.pipeline.Dedup.checkDrops]] with `failEnabled = true`
    * themselves. `logDroppedBuckets` is intentionally ignored in strict
    * mode (nothing is ever dropped — overflow throws). */
  private[pipeline] def auditedOrCapped(banded: DataFrame, keys: Seq[String],
      idCol: String, maxBucket: Int, logDroppedBuckets: Boolean,
      failOnCappedBuckets: Boolean, auditName: String): DataFrame =
    if (failOnCappedBuckets) {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
      banded.withColumn("_bc", count(lit(1)).over(w))
        .filter(assert_true(col("_bc") <= maxBucket, concat(
          lit(s"$auditName: bucket cap $maxBucket binds ("), col("_bc"),
          lit(" banded rows in one bucket) — this mining pass feeds an oracle " +
            "that replays no cap; grow the blocking key space or raise maxBucket")))
          .isNull)
        .drop("_bc")
    } else {
      val mayBind = Dedup.checkDrops(auditName, banded, keys,
        maxBucket, logDroppedBuckets, failEnabled = false)
      if (!mayBind) banded
      else Dedup.capBuckets(banded, keys, idCol, maxBucket)
    }

  /** Banding explode shared by the batch miners and the streaming
    * perceptual-hash store: `(word, bucket, <idCol>, <hashCol>)`, one
    * row per `64/bandBits`-bit word. */
  def bandRows(hashed: DataFrame, idCol: String, hashCol: String,
      bandBits: Int = 8): DataFrame = {
    require(bandBits == 8 || bandBits == 16, s"bandBits must be 8 or 16, got $bandBits")
    val nWords = 64 / bandBits
    val mask = (1L << bandBits) - 1L
    val words = array((0 until nWords).map(w =>
      shiftrightunsigned(col(hashCol), w * bandBits).bitwiseAND(lit(mask))): _*)
    hashed.select(col(idCol), col(hashCol), posexplode(words))
      .withColumnRenamed("pos", "word").withColumnRenamed("col", "bucket")
  }

  /** Manku-style COMBINATION banding (Manku/Jain/Das Sarma, WWW'07 §3):
    * split the 64-bit hash into `blocks` contiguous blocks and key each
    * candidate band on the CONCATENATION of a `pick`-subset of blocks.
    * Pigeonhole: a pair at Hamming h dirties at most h blocks, so some
    * `pick`-subset is clean — and therefore an exact band-key match —
    * whenever `h <= blocks − pick`. The default (10 blocks, pick 2) is
    * COMPLETE for Hamming ≤ 8, the full default verify radius, with 45
    * bands of ~13-bit keys: bucket population scales as N/2^13 per band
    * (32× finer than 8-bit single-word banding) at 45/8 ≈ 5.6× the
    * banding rows — the very-large-corpus trade where the word miner's
    * bucket population, not its row count, is the binding constraint.
    * Same strict cap audit + exact packed-Hamming verify tail. */
  def hamming64NearDuplicatesCombo(hashed: DataFrame, idCol: String,
      hashCol: String, maxHamming: Int, maxBucket: Int = 4096,
      logDroppedBuckets: Boolean = false, failOnCappedBuckets: Boolean = false,
      auditName: String = "combo", blocks: Int = ComboBlocks,
      pick: Int = ComboPick): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= blocks - pick,
      s"combo banding is complete only to blocks - pick = ${blocks - pick}; " +
        s"got maxHamming = $maxHamming (raise blocks or lower pick)")
    val banded = comboBandRows(hashed, idCol, hashCol, blocks, pick)
    val capped = auditedOrCapped(banded, Seq("band", "bkey"), idCol,
      maxBucket, logDroppedBuckets, failOnCappedBuckets, auditName)
    val left = capped.select(col("band"), col("bkey"),
      col(idCol).as("id_a"), col(hashCol).as("ha"))
    val right = capped.select(col("band"), col("bkey"),
      col(idCol).as("id_b"), col(hashCol).as("hb"))
    // verify before the pair-dedup shuffle — see hamming64NearDuplicates:
    // identical rows out (hamming is pair-functional), far fewer rows
    // through the dropDuplicates exchange
    left.join(right, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Block boundaries for [[comboBandRows]]: 64 bits into `blocks`
    * contiguous runs, widths differing by at most one (e.g. 10 blocks =
    * four 7-bit + six 6-bit). */
  private[graft] def blockBounds(blocks: Int): Seq[(Int, Int)] = {
    val base = 64 / blocks
    val extra = 64 % blocks
    val widths = Seq.fill(extra)(base + 1) ++ Seq.fill(blocks - extra)(base)
    widths.scanLeft(0)(_ + _).sliding(2).map { case Seq(a, b) => (a, b - a) }.toSeq
  }

  /** Combination-banding explode: one row per `pick`-subset of blocks —
    * `(band, bkey, <idCol>, <hashCol>)` where `band` indexes the subset
    * and `bkey` concatenates the chosen blocks' bits. */
  def comboBandRows(hashed: DataFrame, idCol: String, hashCol: String,
      blocks: Int = 10, pick: Int = 2): DataFrame = {
    require(blocks >= 2 && blocks <= 16, s"blocks must be in [2,16], got $blocks")
    require(pick >= 1 && pick < blocks, s"pick must be in [1, blocks), got $pick")
    val bounds = blockBounds(blocks)
    def blockVal(b: Int): Column = {
      val (off, w) = bounds(b)
      shiftrightunsigned(col(hashCol), off).bitwiseAND(lit((1L << w) - 1L))
    }
    val subsets = (0 until blocks).combinations(pick).toSeq
    require(subsets.size <= 512, s"${subsets.size} bands — pick a smaller C(blocks, pick)")
    val keys = array(subsets.map(ss =>
      ss.foldLeft(lit(0L))((acc, b) =>
        shiftleft(acc, bounds(b)._2) + blockVal(b))): _*)
    hashed.select(col(idCol), col(hashCol), posexplode(keys))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
  }

  /** Default combination-banding parameters: C(10,2) = 45 bands of
    * ~13-bit keys, pigeonhole-complete for Hamming ≤ `ComboBlocks −
    * ComboPick` = 8 — the full default verify radius. [[mine64]]'s
    * dispatch DERIVES its radius from these (r13 verdict note 1), so
    * changing them cannot silently desynchronize the dispatch from the
    * completeness guarantee. */
  private[graft] val ComboBlocks = 10
  private[graft] val ComboPick = 2

  /** Shared miner dispatch (r13): COMBINATION banding whenever the
    * verify radius sits inside its completeness guarantee `blocks −
    * pick` (the default does — the mined pair set is then the EXACT
    * Hamming graph), word banding for wider radii (no complete
    * equi-join scheme exists there; the recall gates own that regime).
    * Caller-supplied `blocks`/`pick` thread through to the combo miner
    * AND the dispatch radius together. */
  private[graft] def mine64(hashed: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, maxBucket: Int, logDroppedBuckets: Boolean,
      failOnCappedBuckets: Boolean, auditName: String,
      blocks: Int = ComboBlocks, pick: Int = ComboPick): DataFrame =
    if (maxHamming <= blocks - pick)
      hamming64NearDuplicatesCombo(hashed, idCol, hashCol, maxHamming,
        maxBucket, logDroppedBuckets, failOnCappedBuckets, auditName,
        blocks, pick)
    else
      hamming64NearDuplicates(hashed, idCol, hashCol, maxHamming, maxBucket,
        logDroppedBuckets, failOnCappedBuckets, auditName)

  /** Near-duplicate image pairs `(id_a, id_b, hamming)` with
    * `hamming <= maxHamming`, mined by [[mine64]] over the dHash —
    * combination banding at the default radius, so the result is the
    * exact Hamming-≤-8 pair graph. `hashed0` accepts the memoized
    * [[hashFrame]] artifact. */
  def imageNearDuplicates(images: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 8, maxBucket: Int = 4096,
      logDroppedBuckets: Boolean = false,
      failOnCappedBuckets: Boolean = false,
      hashed0: Option[DataFrame] = None): DataFrame = {
    // eager localCheckpoint: one decode+hash pass feeds both join sides
    val hashed = hashed0.getOrElse(
      hashFrame(images, idCol, mediaCol).localCheckpoint(true))
    mine64(hashed, idCol, "dhash", maxHamming, maxBucket,
      logDroppedBuckets, failOnCappedBuckets, auditName = "image")
  }

  // ---------------------------------------------------------- fixture

  /** First md5 byte of `s` (column form) as 0..255 — the same value the
    * DuckDB oracle computes with
    * `CAST(('0x' || substring(md5(s), 1, 2)) AS BIGINT)`. */
  private def md5ByteCol(s: Column): Column =
    conv(substring(md5(s), 1, 2), 16, 10).cast("long")

  /** 2^p for p in 0..7 as an exact integer CASE (both engines). */
  private def pow2Small(p: Column): Column =
    when(p === 0, 1L).when(p === 1, 2L).when(p === 2, 4L).when(p === 3, 8L)
      .when(p === 4, 16L).when(p === 5, 32L).when(p === 6, 64L).otherwise(128L)

  /** md5-derived synthetic 64-bit hash: 8 independent bytes packed into
    * a signed long (top byte sign-adjusted so the arithmetic stays in
    * BIGINT range in both engines). Pure column expressions — the
    * oracle replays it verbatim. */
  def syntheticHash(tag: String, seed: Column): Column =
    (0 until 8).map { k =>
      val b = md5ByteCol(concat(lit(tag + ":"), seed.cast("string"), lit(":" + k)))
      if (k < 7) b * lit(1L << (8 * k))
      else when(b >= 128, (b - 256) * lit(1L << 56)).otherwise(b * lit(1L << 56))
    }.reduce(_ + _)

  /** Flip mask with exactly `flips` bits set, the j-th at bit
    * `8*j + (md5Byte("bp:<id>:<j>") % 8)` — one flip per 8-bit band
    * lane, so a `flips = k` plant dirties exactly k DISTINCT banding
    * words: the adversarial worst case for word banding. `flips` must
    * be ≤ 7 (lane 7 stays clean, so 8-bit banding is GUARANTEED to
    * recover the pair — recall floor 1.0, not a probability). */
  def flipMask(id: Column, flips: Column): Column =
    (0 until 7).map { j =>
      when(flips > j,
        lit(1L << (8 * j)) * pow2Small(
          md5ByteCol(concat(lit("bp:"), id.cast("string"), lit(":" + j))) % 8))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** 8-flip mask: EXACTLY one flip in every 8-bit lane (lane 7 keeps to
    * bits 56..62 so the mask sum stays positive in BIGINT on both
    * engines) — the documented escape case of single-8-bit-word banding
    * (every word dirty), still inside the combo miner's completeness
    * radius `blocks − pick = 8`. */
  def flipMask8(id: Column): Column =
    (0 until 8).map { j =>
      val span = if (j == 7) 7 else 8
      lit(1L << (8 * j)) * pow2Small(
        md5ByteCol(concat(lit("bp8:"), id.cast("string"), lit(":" + j))) % span)
    }.reduce(_ + _)

  /** `band_recall_combo` fixture hash: ids with `id % 10 == 1` carry
    * the hash of `id − 1` with EXACTLY 8 flips, one per 8-bit word —
    * pairs single-word banding is guaranteed to MISS and combination
    * banding is guaranteed to FIND. */
  def bandFixtureHash8(id: Column): Column =
    when(id % 10 === 1, syntheticHash("bh8", id - 1).bitwiseXOR(flipMask8(id)))
      .otherwise(syntheticHash("bh8", id))

  /** `band_recall` fixture hash for a document id: ids with
    * `id % 10 == 1` carry the hash of `id − 1` with `5 + id % 3`
    * (∈ {5,6,7}) distinct-word bit flips — plants that land EXACTLY in
    * the Hamming 5–7 band the default miner claims, spread across the
    * maximum number of banding words. */
  def bandFixtureHash(id: Column): Column = {
    val planted = id % 10 === 1
    when(planted, syntheticHash("bh", id - 1)
        .bitwiseXOR(flipMask(id, lit(5L) + id % 3)))
      .otherwise(syntheticHash("bh", id))
  }

  /** First md5 byte of `s` as 0..255 — the deterministic value source a
    * DuckDB oracle regenerates with
    * `CAST(('0x' || substring(md5(s), 1, 2)) AS BIGINT)`. */
  def md5Byte(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d(0) & 0xFF
  }

  /** Grayscale value of pixel `(x, y)` of image `id` in the
    * deterministic fixture: ids with `id % plantEvery == 1` are PLANTED
    * near-duplicates of `id − 1` — same md5-derived base pixels, plus a
    * ±1 perturbation on ~20% of pixels (md5-derived too), the re-encode/
    * noise regime a perceptual hash exists for. Everything here is
    * exactly replayable in SQL. */
  def pixel(id: Long, plantEvery: Int, x: Int, y: Int): Int = {
    val planted = plantEvery > 0 && id % plantEvery == 1
    val seed = if (planted) id - 1 else id
    val v = md5Byte(s"img:$seed:$x:$y")
    if (!planted) v
    else {
      val d = md5Byte(s"pert:$id:$x:$y") % 10 match {
        case 0 => 1
        case 1 => -1
        case _ => 0
      }
      math.max(0, math.min(255, v + d))
    }
  }

  /** One REAL PNG (lossless — decoded pixels equal authored pixels) of
    * the fixture image for `id`. */
  def makePng(id: Long, plantEvery: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pixel(id, plantEvery, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic image table derived from a document frame: one
    * 27×16 grayscale PNG per id (27 = 9 grid columns × 3 px, 16 = 8 rows
    * × 2 px — exact 3×2 blocks, so the oracle's block means are plain
    * 6-pixel integer averages). Narrow map, no shuffle. */
  def imageTable(docs: DataFrame, idCol: String = "doc_id",
      plantEvery: Int = 50, w: Int = 27, h: Int = 16): DataFrame = {
    val ids = docs.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    ids.mapPartitions(_.map(id => (id, makePng(id, plantEvery, w, h))))(
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "media")
  }
}
