package graft.pipeline

import graft.SparkSpec
import graft.functions.{ImageHash, VideoHash}
import org.apache.spark.sql.functions._

class VideoDedupSpec extends SparkSpec {
  import sqlImplicits._

  test("majority fold: strict majority per bit, exact half clears") {
    // 4 "frames": bit 0 set in 3 (majority), bit 1 set in 2 (tie -> 0),
    // bit 63 set in all 4
    val h = VideoHash.majority(Seq(
      1L | (1L << 1) | Long.MinValue,
      1L | (1L << 1) | Long.MinValue,
      1L | Long.MinValue,
      Long.MinValue))
    assert(h === (1L | Long.MinValue))
  }

  test("clip hash matches a per-frame dHash majority replay on the fixture") {
    val id = 7L
    val avi = VideoDedup.makeAvi(id, 50, 4, 27, 16)
    val frames = Multimodal.decodeAviFrames(avi).get
    assert(frames.size === 4)
    val perFrame = frames.map(f => ImageHash.dHash(f).longValue())
    // and per-frame hashes equal the authored-pixel arithmetic
    val expect0 = {
      val gray = Array.tabulate(16 * 27)(i => VideoDedup.vpixel(id, 50, 0, i % 27, i / 27))
      ImageHash.dHashFromGray(gray, 27, 16)
    }
    assert(perFrame.head === expect0)
    assert(VideoHash.clipHash(avi).longValue() === VideoHash.majority(perFrame))
  }

  test("planted noised clips stay near; distinct clips stay far") {
    val h0 = VideoHash.clipHash(VideoDedup.makeAvi(0L, 0, 4, 27, 16)).longValue()
    val h1 = VideoHash.clipHash(VideoDedup.makeAvi(1L, 0, 4, 27, 16)).longValue()
    // planted copy of clip 50 (51 % 50 == 1)
    val h50 = VideoHash.clipHash(VideoDedup.makeAvi(50L, 0, 4, 27, 16)).longValue()
    val h51 = VideoHash.clipHash(VideoDedup.makeAvi(51L, 50, 4, 27, 16)).longValue()
    assert(java.lang.Long.bitCount(h50 ^ h51) <= 8)
    assert(java.lang.Long.bitCount(h0 ^ h1) > 12)
  }

  test("undecodable payloads hash to null and drop; truncated AVI still hashes") {
    val avi = VideoDedup.makeAvi(3L, 0, 4, 27, 16)
    val truncated = java.util.Arrays.copyOf(avi, avi.length - 40) // clips last frame
    assert(VideoHash.clipHash(truncated) != null)
    val df = Seq(
      (1L, avi),
      (2L, "not a video".getBytes("UTF-8"))).toDF("id", "media")
    assert(VideoDedup.hashFrame(df, "id", "media")
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("frame-set overlap finds trimmed copies (3 of 4 frames bit-exact, jaccard 0.6)") {
    val n = 60
    val df = (0L until n.toLong).map(id =>
      (id, VideoDedup.makeAvi(id, 50, 4, 27, 16))).toDF("doc_id", "media")
    val pairs = VideoDedup.frameOverlapPairs(df, "doc_id", "media",
        minJaccard = 0.5, failOnCappedBuckets = true)
      .select("id_a", "id_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
    // id 26 is a trimmed copy of 25; id 1 is a NOISED copy of 0 whose
    // frames may or may not hash identically — assert the trim plant
    val trim = pairs.find(p => p._1 == 25L && p._2 == 26L)
    assert(trim.isDefined, s"trimmed pair missing: ${pairs.toSeq}")
    assert(trim.get._3 === 3L && trim.get._4 === 0.6)
    // no overlap between unrelated clips
    assert(pairs.forall(p => p._2 - p._1 == 1), s"unrelated overlap: ${pairs.toSeq}")
  }

  test("a binding bucket cap keeps jaccard a TRUE Jaccard of the mined frame sets") {
    // frame hash H is shared by clips 1,2,3 — at maxBucket=2 the cap
    // keeps only clips 1,2 in H's bucket; X is shared by 2,3 (uncapped).
    // The capped sets are 1:{H}, 2:{H,X}, 3:{X}; jaccard(2,3) over the
    // MINED sets is 1/2. Denominators from the uncapped sets would give
    // 1/3 and silently drop the pair below minJaccard=0.5 (r13 verdict
    // note 2 — the skew this spec pins closed).
    val frames = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), // H
      (2L, 200L), (3L, 200L)              // X
    ).toDF("doc_id", "fhash")
    val pairs = VideoDedup.frameOverlapPairs(frames, "doc_id", "media",
        minJaccard = 0.5, maxBucket = 2, logDroppedBuckets = false,
        frames0 = Some(frames))
      .select("id_a", "id_b", "shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(pairs.get((2L, 3L)).contains((1L, 0.5)),
      s"capped jaccard(2,3) must be the true Jaccard of the mined sets: $pairs")
    assert(pairs.get((1L, 2L)).contains((1L, 0.5)), s"jaccard(1,2): $pairs")
    assert(!pairs.contains((1L, 3L)), s"clip 3's H row was capped away: $pairs")
    // uncapped (audit passes, strict): the exact frame-set Jaccard
    val exact = VideoDedup.frameOverlapPairs(frames, "doc_id", "media",
        minJaccard = 0.3, maxBucket = 4096, failOnCappedBuckets = true,
        frames0 = Some(frames))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(exact.map(r => ((r._1, r._2), r._3)).toMap ===
      Map((1L, 2L) -> 0.5, (1L, 3L) -> 0.5, (2L, 3L) -> 1.0))
  }

  test("strict frame-overlap audit still throws on overflow with the " +
      "one-sided window (r15)") {
    // hash 100 is shared by 5 clips; maxBucket = 4 binds. r15 moved the
    // count-window+assert onto the LEFT join side only (counts and the
    // probe side read the un-audited set — strict mode never drops
    // rows), so this pins that the overflow still fails loudly.
    val frames = (1L to 5L).map(i => (i, 100L)).toDF("doc_id", "fhash")
    val e = intercept[Exception] {
      VideoDedup.frameOverlapPairs(frames, "doc_id", "media",
        minJaccard = 0.1, maxBucket = 4, failOnCappedBuckets = true,
        frames0 = Some(frames)).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("bucket cap")), messages(e).mkString(" | "))
  }

  test("miner finds planted clip pairs via the shared banding, no false positives") {
    val n = 120
    val rows = (0L until n.toLong).map(id =>
      (id, VideoDedup.makeAvi(id, 50, 4, 27, 16)))
    val df = rows.toDF("doc_id", "media")
    val pairs = VideoDedup.videoNearDuplicates(df, "doc_id", "media",
        maxHamming = 8, failOnCappedBuckets = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until n.toLong).filter(_ % 50 == 1).map(i => (i - 1, i)).toSet
    assert(planted.subsetOf(pairs), s"missed ${planted -- pairs}")
    // trim plants (id % 50 == 26) share 3 of 4 frames — whether their
    // clip-hash distance clears maxHamming is data-dependent and fine
    // either way; anything else is a false positive
    val unexpected = (pairs -- planted).filterNot(p => p._2 % 50 == 26 && p._1 == p._2 - 1)
    assert(unexpected.isEmpty, s"false positives: $unexpected")
  }
}
