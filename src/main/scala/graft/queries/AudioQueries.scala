package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.AudioDedup

/** Audio perceptual-hash + near-dup keys — see
  * [[graft.pipeline.AudioDedup]]. Both FULL hash-match: WAV PCM is
  * lossless, so the oracle regenerates the md5-derived sample stream
  * and replays envelope → hash → banding → Hamming, covering the
  * `javax.sound` decode path end-to-end (a decode bug changes the hash).
  */
object AudioQueries {

  private val hashFrames =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private def audioHashFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    hashFrames.computeIfAbsent(sessionKey(s, dir),
      _ => AudioDedup.hashFrame(
        AudioDedup.audioTable(table(s, dir, "documents")), "doc_id", "media")
        .localCheckpoint(true))

  val defs: Map[String, Q] = Map(
    // Envelope hash per clip: real WAV decode → |amplitude| → 65-block
    // integer envelope → 64 comparison bits.
    "audio_phash" -> ((s, dir) =>
      audioHashFor(s, dir).select(col("doc_id"), col("ahash"))),

    // Near-duplicate clip pairs via the SHARED image/audio banding
    // machinery; strict cap audit (the oracle replays no cap).
    "audio_neardup" -> ((s, dir) =>
      AudioDedup.audioNearDuplicates(table(s, dir, "documents"), "doc_id", "media",
        maxHamming = 8, failOnCappedBuckets = true,
        hashed0 = Some(audioHashFor(s, dir)))))

  /** Sample regeneration → envelope → hash CTEs ending in
    * `ahash_t(doc_id, ahash)`. */
  private val ahashCtes =
    """apx AS (
      |  SELECT d.doc_id,
      |    CASE WHEN d.doc_id % 50 = 1 THEN d.doc_id - 1 ELSE d.doc_id END AS seed,
      |    si.i
      |  FROM documents d, (SELECT unnest(generate_series(0, 519)) AS i) si),
      |apv AS (
      |  SELECT doc_id, i,
      |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END
      |      + (CASE WHEN doc_id % 50 = 1 THEN
      |           (CASE (CAST(('0x' || substring(md5('apert:' || CAST(doc_id AS VARCHAR) || ':' ||
      |              CAST(i AS VARCHAR)), 1, 2)) AS BIGINT) % 10)
      |            WHEN 0 THEN 16 WHEN 1 THEN -16 ELSE 0 END)
      |         ELSE 0 END) AS s0
      |  FROM (SELECT doc_id, i,
      |          CAST(('0x' || substring(md5('aud:' || CAST(seed AS VARCHAR) || ':' ||
      |            CAST(i AS VARCHAR)), 1, 4)) AS BIGINT) AS u
      |        FROM apx)),
      |apa AS (SELECT doc_id, i,
      |          abs(greatest(-32768, least(32767, s0))) AS a FROM apv),
      |aenv AS (
      |  SELECT doc_id, i // 8 AS b, sum(a) // 8 AS e
      |  FROM apa GROUP BY doc_id, i // 8),
      |abits AS (
      |  SELECT x.doc_id, x.b
      |  FROM aenv x JOIN aenv y ON y.doc_id = x.doc_id AND y.b = x.b + 1
      |  WHERE x.b < 64 AND x.e > y.e),
      |ahash_t AS (
      |  SELECT d.doc_id,
      |    CAST(coalesce(sum(CASE WHEN i.b = 63 THEN -9223372036854775807 - 1
      |      ELSE (CAST(1 AS BIGINT) << CAST(i.b AS INTEGER)) END), 0) AS BIGINT) AS ahash
      |  FROM documents d LEFT JOIN abits i ON i.doc_id = d.doc_id
      |  GROUP BY d.doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "audio_phash" ->
      s"""WITH $ahashCtes
         |SELECT doc_id, ahash FROM ahash_t""".stripMargin,

    "audio_neardup" ->
      s"""WITH $ahashCtes,
         |aw AS (
         |  SELECT doc_id, ahash,
         |    ((CAST(ahash AS HUGEINT) + 18446744073709551616) % 18446744073709551616) AS hu
         |  FROM ahash_t),
         |${comboCandSql("aw", "ahash", "a")}
         |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM acand WHERE bit_count(xor(ha, hb)) <= 8""".stripMargin)
}
