package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Knn, RangeSearch}

/** Vector-search surface over the driver's `embeddings` table (64-dim
  * float32): exact kNN / range search / centroid & global-mean aggregates
  * (SURVEY §2.4, §2.8 Linear paths).
  */
object VectorQueries {

  val defs: Map[String, Q] = Map(
    // Exact single-query kNN (LinearSearch semantics): query = vec_id 0.
    "knn_euclidean" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Knn.single(e.crossJoin(broadcast(q)), "vec_id", "embedding", col("qv"), k = 10)
    }),

    // Batch multi-query kNN: 5 query vectors, per-query top-5 via the
    // bounded-heap aggregator (map-side combine; shuffle is queries×k).
    "knn_multi" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Knn.batch(e, "vec_id", "embedding", q, "query_id", "qv", k = 5)
    }),

    // Exact range (radius) search, ordered by (dist, id).
    "range_euclidean" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      RangeSearch.single(e.crossJoin(broadcast(q)), "vec_id", "embedding", col("qv"), radius = 1.25)
    }),

    // Element-wise centroid per label — BallTree node-center aggregate
    // (BallTree.cs:167-183) exploded to (label, pos, avg_val) rows.
    "centroid_by_label" -> ((s, dir) => {
      table(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(round(avg(col("x")), 6).as("avg_val"))
    }),

    // Global scalar mean of every component — the BQ default threshold
    // (BinaryQuantization.cs:92-109).
    "global_mean" -> ((s, dir) => {
      table(s, dir, "embeddings")
        .select(explode(col("embedding")).as("x"))
        .agg(round(avg(col("x")), 6).as("global_mean"))
    }))

  private val knnDist = sqlEuclid("e.embedding", "q.qv")

  val oracles: Map[String, String] = Map(
    "knn_euclidean" ->
      s"""SELECT e.vec_id AS vec_id, $knnDist AS dist
         |FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "knn_multi" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
         |d AS (SELECT q.query_id AS query_id, e.vec_id AS vec_id, ${sqlEuclid("e.embedding", "q.qv")} AS dist
         |      FROM embeddings e CROSS JOIN q)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, dist
         |FROM (SELECT query_id, vec_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
         |      FROM d)
         |WHERE rank <= 5""".stripMargin,

    "range_euclidean" ->
      s"""SELECT vec_id, dist FROM (
         |  SELECT e.vec_id AS vec_id, $knnDist AS dist
         |  FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q)
         |WHERE dist <= 1.25 ORDER BY dist, vec_id""".stripMargin,

    "centroid_by_label" ->
      """SELECT label, i - 1 AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS avg_val
        |FROM embeddings, generate_series(1, 64) t(i)
        |GROUP BY label, i""".stripMargin,

    "global_mean" ->
      """SELECT round(avg(CAST(u AS DOUBLE)), 6) AS global_mean
        |FROM (SELECT unnest(embedding) AS u FROM embeddings)""".stripMargin)
}
