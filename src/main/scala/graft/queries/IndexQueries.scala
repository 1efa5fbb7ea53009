package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.index.BinaryQuantization

/** Approximate-index query surface (SURVEY §2.8: LSH / BQ / PQ pipelines).
  * Every query here is deterministic end-to-end so the DuckDB oracle can
  * replay the full pipeline, not just the re-rank.
  */
object IndexQueries {

  /** Driver-side fetch of one embedding as the query vector. */
  private def embeddingOf(s: org.apache.spark.sql.SparkSession, dir: String, vecId: Long): Array[Float] =
    table(s, dir, "embeddings").filter(col("vec_id") === vecId)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray

  val defs: Map[String, Q] = Map(
    // BQ normal path: query vector is row 0, which packs to hamming 0 with
    // itself, so the <= min(dim/4,64)=16 prefilter always has candidates.
    "bq_knn" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      BinaryQuantization.search(e, "vec_id", "embedding", embeddingOf(s, dir, 0), k = 10)
    }),

    // BQ fallback path: a constant far-off query (all components 10.0 >>
    // data range) packs to all-ones; random data sits ~32 bits away, so no
    // vector passes the 16-bit prefilter and the 3k-closest-by-Hamming
    // fallback (BinaryQuantization.cs:167-174) is exercised.
    "bq_knn_fallback" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      BinaryQuantization.search(e, "vec_id", "embedding", Array.fill(64)(10.0f), k = 10)
    }),

    // Pure packed-Hamming kernel over integer-derived words (bit_count(xor)
    // on both engines; vectors' own packing is covered by bq_knn above).
    "hamming_packed" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          Distances.hammingPacked(
            array(col("l_orderkey").cast("long"), col("l_partkey").cast("long")),
            array(col("l_suppkey").cast("long"), col("l_linenumber").cast("long"))).as("hp"))
    }))

  private val gmCte =
    """gm AS (SELECT avg(CAST(u AS DOUBLE)) AS t
      |       FROM (SELECT unnest(embedding) AS u FROM embeddings))""".stripMargin

  /** Count of sign-bit mismatches — the unpacked formulation of packed
    * Hamming distance (DuckDB cannot shift into bit 63, so the oracle
    * compares sign bits directly; the Spark side's packed words encode the
    * same predicate). */
  private def sqlSignHamming(a: String, b: String): String =
    s"""CAST(list_reduce(list_transform(list_zip($a, $b),
       | p -> CASE WHEN (CAST(p[1] AS DOUBLE) >= gm.t) != (CAST(p[2] AS DOUBLE) >= gm.t)
       |      THEN 1 ELSE 0 END), (x,y) -> x+y) AS BIGINT)""".stripMargin

  private val const10 = "[" + Seq.fill(64)("10.0").mkString(",") + "]"

  val oracles: Map[String, String] = Map(
    "bq_knn" ->
      s"""WITH $gmCte,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |h AS (SELECT e.vec_id AS vec_id,
         |        ${sqlSignHamming("e.embedding", "q.qv")} AS hamming,
         |        ${sqlEuclid("e.embedding", "q.qv")} AS dist
         |      FROM embeddings e, q, gm)
         |SELECT vec_id, hamming, dist FROM h
         |WHERE hamming <= 16 ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "bq_knn_fallback" ->
      s"""WITH $gmCte,
         |h AS (SELECT e.vec_id AS vec_id,
         |        ${sqlSignHamming("e.embedding", const10)} AS hamming,
         |        ${sqlEuclid("e.embedding", const10)} AS dist
         |      FROM embeddings e, gm),
         |cand AS (SELECT * FROM h ORDER BY hamming, vec_id LIMIT 30)
         |SELECT vec_id, hamming, dist FROM cand ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "hamming_packed" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(bit_count(xor(CAST(l_orderkey AS BIGINT), CAST(l_suppkey AS BIGINT)))
        |    + bit_count(xor(CAST(l_partkey AS BIGINT), CAST(l_linenumber AS BIGINT))) AS BIGINT) AS hp
        |FROM lineitem WHERE l_orderkey <= 2000""".stripMargin)
}
