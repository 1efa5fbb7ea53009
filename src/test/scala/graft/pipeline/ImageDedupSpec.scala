package graft.pipeline

import graft.SparkSpec
import graft.functions.ImageHash
import org.apache.spark.sql.functions._

class ImageDedupSpec extends SparkSpec {
  import sqlImplicits._

  /** Deterministic "photo": smooth gradient + md5 texture (smoothness is
    * what makes perceptual hashing meaningful — block means survive
    * re-encode/resize). */
  private def photo(seed: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // gradient direction depends on the seed (different PICTURES, not
      // just different noise on the same picture — dHash is supposed to
      // treat the latter as near-duplicates)
      val gx = if (seed % 2 == 0) x else w - 1 - x
      val base = (gx * 255 / w + y * 255 / h) / 2
      val tex = ImageDedup.md5Byte(s"t:$seed:${x / 4}:${y / 4}") / 8
      val v = math.min(255, base + tex)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def resized(img: java.awt.image.BufferedImage, w: Int, h: Int) = {
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash survives re-encode (JPEG) and resize; distinct photos stay far") {
    val base = photo(1, 64, 48)
    val h0 = ImageHash.dHash(png(base)).longValue()
    // JPEG re-encode: lossy pixels, same picture
    assert(hamming(h0, ImageHash.dHash(jpeg(base)).longValue()) <= 8)
    // 2x upscale and asymmetric downscale: same picture
    assert(hamming(h0, ImageHash.dHash(png(resized(base, 128, 96))).longValue()) <= 8)
    assert(hamming(h0, ImageHash.dHash(png(resized(base, 45, 30))).longValue()) <= 8)
    // a different photo is near the random expectation (32), far past 8
    val other = photo(2, 64, 48)
    assert(hamming(h0, ImageHash.dHash(png(other)).longValue()) > 12)
  }

  test("dHash kernel matches a naive driver replay on the oracle fixture geometry") {
    // 27x16 grayscale: block means are exact 6-pixel integer averages —
    // replay the documented arithmetic directly
    val id = 7L
    val gray = Array.tabulate(16, 27)((y, x) => ImageDedup.pixel(id, 50, x, y))
    val flat = gray.flatten
    val kernel = ImageHash.dHashFromGray(flat, 27, 16)
    var expect = 0L
    val m = Array.tabulate(8, 9)((by, bx) => {
      var s = 0L
      for (y <- by * 2 until by * 2 + 2; x <- bx * 3 until bx * 3 + 3) s += gray(y)(x)
      s / 6
    })
    for (b <- 0 until 64) {
      if (m(b / 8)(b % 8) > m(b / 8)(b % 8 + 1)) expect |= (1L << b)
    }
    assert(kernel === expect)
    // and the PNG round trip reproduces the same hash (lossless)
    val viaPng = ImageHash.dHash(ImageDedup.makePng(id, 50, 27, 16))
    assert(viaPng.longValue() === kernel)
  }

  test("md5Byte matches the SQL idiom value (engine-shared hash source)") {
    // DuckDB: SELECT CAST(('0x' || substring(md5('img:3:1:2'),1,2)) AS BIGINT) = 147
    assert(ImageDedup.md5Byte("img:3:1:2") === 147)
  }

  test("undecodable media hashes to null and is dropped by the miner") {
    val df = Seq(
      (1L, ImageDedup.makePng(1L, 0, 27, 16)),
      (2L, "not an image".getBytes("UTF-8"))).toDF("id", "media")
    val hashed = ImageDedup.hashFrame(df, "id", "media")
    assert(hashed.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("strict mode fails loudly at mining time when a bucket overflows " +
      "(r14 inline window audit)") {
    // 10 identical hashes share every bucket; maxBucket = 4 binds, and a
    // strict caller must hear about it when the mining job runs
    val rows = (1L to 10L).map(i => (i, 0x0123456789abcdefL)).toDF("id", "h")
    val e = intercept[Exception] {
      ImageDedup.hamming64NearDuplicates(rows, "id", "h", maxHamming = 8,
        maxBucket = 4, logDroppedBuckets = false, failOnCappedBuckets = true,
        auditName = "spec").count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("bucket cap")), messages(e).mkString(" | "))
    // the combo miner shares the dispatch
    val e2 = intercept[Exception] {
      ImageDedup.hamming64NearDuplicatesCombo(rows, "id", "h", maxHamming = 8,
        maxBucket = 4, failOnCappedBuckets = true).count()
    }
    assert(messages(e2).exists(_.contains("bucket cap")), messages(e2).mkString(" | "))
    // non-strict mode still mines (cap = recall loss only)
    ImageDedup.hamming64NearDuplicates(rows, "id", "h", maxHamming = 8,
      maxBucket = 4, logDroppedBuckets = false, failOnCappedBuckets = false,
      auditName = "spec").collect()
  }

  test("miner finds planted near-dups, no false positives among distinct images") {
    val n = 120
    val rows = (0L until n.toLong).map(id =>
      (id, ImageDedup.makePng(id, 50, 27, 16)))
    val df = rows.toDF("doc_id", "media")
    val pairs = ImageDedup.imageNearDuplicates(df, "doc_id", "media",
        maxHamming = 8, failOnCappedBuckets = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until n.toLong).filter(_ % 50 == 1).map(i => (i - 1, i)).toSet
    assert(planted.subsetOf(pairs), s"missed ${planted -- pairs}")
    assert((pairs -- planted).isEmpty, s"false positives: ${pairs -- planted}")
  }

  test("8-bit banding is pigeonhole-complete to Hamming 7 (property, adversarial spread)") {
    // pairs at Hamming k <= 7 with each flip in a DISTINCT 8-bit word —
    // the spread that defeats banding hardest — must ALWAYS be found
    val rnd = new scala.util.Random(1234)
    val rows = (0 until 40).flatMap { i =>
      val base = rnd.nextLong()
      val k = 5 + i % 3 // 5, 6, 7
      val lanes = rnd.shuffle((0 until 8).toList).take(k)
      val mask = lanes.map(l => 1L << (8 * l + rnd.nextInt(8))).reduce(_ | _)
      Seq((i * 2L, base), (i * 2L + 1, base ^ mask))
    }
    val pairs = ImageDedup.hamming64NearDuplicates(
        rows.toDF("id", "h"), "id", "h", maxHamming = 8, maxBucket = 4096,
        logDroppedBuckets = false, failOnCappedBuckets = true, auditName = "spec")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 40).map(i => (i * 2L, i * 2L + 1)).toSet
    assert(planted.subsetOf(pairs), s"pigeonhole violated: ${planted -- pairs}")
  }

  test("a Hamming-8 pair flipping ALL 8 words is the documented banding escape") {
    val base = 0x123456789abcdefL
    val mask = (0 until 8).map(l => 1L << (8 * l)).reduce(_ | _) // one flip per word
    val pairs = ImageDedup.hamming64NearDuplicates(
      Seq((1L, base), (2L, base ^ mask)).toDF("id", "h"), "id", "h",
      maxHamming = 8, maxBucket = 4096, logDroppedBuckets = false,
      failOnCappedBuckets = true, auditName = "spec")
    assert(pairs.count() === 0L) // no shared word -> never a candidate
    // ...but the same 8 flips bunched into 7 words (word 7 clean) IS found
    val bunched = (0 until 7).map(l => 1L << (8 * l)).reduce(_ | _) | (1L << 1)
    val found = ImageDedup.hamming64NearDuplicates(
      Seq((1L, base), (2L, base ^ bunched)).toDF("id", "h"), "id", "h",
      maxHamming = 8, maxBucket = 4096, logDroppedBuckets = false,
      failOnCappedBuckets = true, auditName = "spec")
    assert(found.count() === 1L)
  }

  test("combo(10,2) banding equals brute force for Hamming <= 8 (property)") {
    val rnd = new scala.util.Random(77)
    // random hashes + planted pairs across the whole 0..8 radius,
    // including 8 flips spread over 8 distinct words (the single-word
    // banding escape)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var id = 0L
    (0 until 30).foreach { i =>
      val base = rnd.nextLong()
      val k = i % 9
      val lanes = rnd.shuffle((0 until 8).toList).take(math.min(k, 8))
      var mask = 0L
      lanes.foreach(l => mask |= 1L << (8 * l + rnd.nextInt(8)))
      while (java.lang.Long.bitCount(mask) < k) mask |= 1L << rnd.nextInt(64)
      rows += ((id, base)); rows += ((id + 1, base ^ mask)); id += 2
    }
    val df = rows.toSeq.toDF("id", "h")
    val combo = ImageDedup.hamming64NearDuplicatesCombo(df, "id", "h",
        maxHamming = 8, failOnCappedBuckets = true)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    // brute force over all pairs
    val all = rows.toSeq
    val brute = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 8
    } yield (a, b, d.toLong)).toSet
    assert(combo === brute, s"missing ${brute -- combo}, extra ${combo -- brute}")
  }

  test("combo banding finds the 8-flips-in-8-words pairs single-word banding misses") {
    val rnd = new scala.util.Random(5)
    val base = rnd.nextLong()
    val mask = (0 until 8).map(l => 1L << (8 * l + rnd.nextInt(8))).reduce(_ | _)
    assert(java.lang.Long.bitCount(mask) === 8)
    val df = Seq((1L, base), (2L, base ^ mask)).toDF("id", "h")
    assert(ImageDedup.hamming64NearDuplicates(df, "id", "h", 8, 4096,
      logDroppedBuckets = false, failOnCappedBuckets = true, "spec").count() === 0L)
    assert(ImageDedup.hamming64NearDuplicatesCombo(df, "id", "h", 8).count() === 1L)
  }

  test("comboBandRows shape: C(10,2)=45 bands per row, keys within the concat width") {
    val df = Seq((1L, 0x0123456789abcdefL)).toDF("id", "h")
    val rows = ImageDedup.comboBandRows(df, "id", "h")
      .select("band", "bkey").as[(Int, Long)].collect()
    assert(rows.length === 45)
    assert(rows.map(_._1).toSet === (0 until 45).toSet)
    assert(rows.forall(r => r._2 >= 0 && r._2 < (1L << 14))) // <= 7+7 bits
  }

  test("mine64 dispatch radius IS the combo completeness bound blocks - pick (property)") {
    // a Hamming-8 pair with one flip per 8-bit word: combo(blocks,pick)
    // finds it iff 8 <= blocks - pick, word banding NEVER does. mine64
    // must therefore find it exactly when its dispatch chose combo with
    // a sufficient radius — proving dispatch === completeness check for
    // caller-supplied blocks/pick, not just the defaults (r13 verdict
    // note 1).
    val base = 0x5a5a5a5a5a5a5a5aL
    val mask = (0 until 8).map(l => 1L << (8 * l)).reduce(_ | _)
    val df = Seq((1L, base), (2L, base ^ mask)).toDF("id", "h")
    def mined(blocks: Int, pick: Int): Long =
      ImageDedup.mine64(df, "id", "h", maxHamming = 8, maxBucket = 4096,
        logDroppedBuckets = false, failOnCappedBuckets = true,
        auditName = "spec", blocks = blocks, pick = pick).count()
    assert(mined(ImageDedup.ComboBlocks, ImageDedup.ComboPick) === 1L)
    assert(ImageDedup.ComboBlocks - ImageDedup.ComboPick >= 8) // default covers radius 8
    assert(mined(12, 4) === 1L) // 12 - 4 = 8: combo, complete
    assert(mined(10, 3) === 0L) // 10 - 3 = 7 < 8: dispatch falls to word banding
    // and the combo miner itself refuses a radius beyond its guarantee
    intercept[IllegalArgumentException] {
      ImageDedup.hamming64NearDuplicatesCombo(df, "id", "h", maxHamming = 9)
    }
  }

  test("hamming column is the exact packed distance") {
    val df = Seq(
      (0L, ImageDedup.makePng(0L, 0, 27, 16)),
      (1L, ImageDedup.makePng(1L, 50, 27, 16))).toDF("doc_id", "media")
    val row = ImageDedup.imageNearDuplicates(df, "doc_id", "media", maxHamming = 64)
      .head()
    val h0 = ImageHash.dHash(ImageDedup.makePng(0L, 0, 27, 16)).longValue()
    val h1 = ImageHash.dHash(ImageDedup.makePng(1L, 50, 27, 16)).longValue()
    assert(row.getAs[Long]("hamming") === hamming(h0, h1).toLong)
  }
}
