package graft.pipeline

import graft.SparkSpec
import graft.functions.AudioHash

class AudioDedupSpec extends SparkSpec {
  import sqlImplicits._

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("envelope hash: noised copy stays near, distinct clip stays far") {
    val base = AudioDedup.makeWav(0L, 0, 520)
    val noised = AudioDedup.makeWav(1L, 50, 520) // planted copy of clip 0
    val other = AudioDedup.makeWav(2L, 0, 520)
    val h0 = AudioHash.hash64(base).longValue()
    assert(hamming(h0, AudioHash.hash64(noised).longValue()) <= 8)
    assert(hamming(h0, AudioHash.hash64(other).longValue()) > 12)
  }

  test("hash matches a naive driver replay on the fixture geometry") {
    val id = 7L
    val abs = Array.tabulate(520)(i => math.abs(AudioDedup.sample(id, 50, i)))
    val env = Array.tabulate(65)(b => abs.slice(b * 8, b * 8 + 8).map(_.toLong).sum / 8)
    var expect = 0L
    for (b <- 0 until 64) if (env(b) > env(b + 1)) expect |= (1L << b)
    assert(AudioHash.hash64FromAbs(abs) === expect)
    // and the WAV round trip reproduces it (PCM16 lossless)
    assert(AudioHash.hash64(AudioDedup.makeWav(id, 50, 520)).longValue() === expect)
  }

  test("resampled-length envelope stays close on SMOOTH signals (floor-boundary blocks)") {
    // truncating a clip shifts block boundaries; on a smooth waveform
    // (real audio) the block means barely move — perceptual robustness.
    // (On md5 white noise it would NOT hold; that is the generator's
    // property, not the hash's — noise has no envelope to preserve.)
    def smooth(n: Int) = Array.tabulate(n)(i =>
      (16384 + 12000 * math.sin(2 * math.Pi * i / 97.0)).toInt)
    assert(hamming(AudioHash.hash64FromAbs(smooth(520)),
      AudioHash.hash64FromAbs(smooth(520).take(508))) <= 8)
  }

  test("undecodable / non-PCM16 media hashes to null and is dropped") {
    val df = Seq(
      (1L, AudioDedup.makeWav(1L, 0, 520)),
      (2L, "not audio".getBytes("UTF-8"))).toDF("id", "media")
    assert(AudioDedup.hashFrame(df, "id", "media")
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("miner finds planted pairs via the shared banding, no false positives") {
    val n = 120
    val df = (0L until n.toLong).map(id => (id, AudioDedup.makeWav(id, 50, 520)))
      .toDF("doc_id", "media")
    val pairs = AudioDedup.audioNearDuplicates(df, "doc_id", "media",
        maxHamming = 8, failOnCappedBuckets = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until n.toLong).filter(_ % 50 == 1).map(i => (i - 1, i)).toSet
    assert(planted.subsetOf(pairs), s"missed ${planted -- pairs}")
    assert((pairs -- planted).isEmpty, s"false positives: ${pairs -- planted}")
  }
}
