package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{Distances, VectorArithmetic}
import graft.ops.{Knn, RangeSearch, ThresholdFilter}

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

    // Batch amortization at 100 queries: the per-query cost of the bounded
    // -heap plan is what the engine's throughput contract rests on
    // (BASELINE.md spark_approach; single-query latency is job overhead).
    "knn_batch_100" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Knn.batch(e, "vec_id", "embedding", q, "query_id", "qv", k = 10)
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

    // Max-distance (ball radius) aggregate per label: the BallTree node
    // radius (BallTree.cs:34,141,152-165) = max distance of members to the
    // element-wise centroid. Mixed float/double arrays flow through the
    // same codegen distance kernel.
    "ball_radius" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val centroid = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("x")), 6).as("v"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
          p => p.getField("v")).as("centroid"))
      e.join(centroid, "label")
        .withColumn("d", round(Distances.euclidean(col("embedding"), col("centroid")), 6))
        .groupBy(col("label"))
        .agg(max(col("d")).as("radius"))
    }),

    // Global scalar mean of every component — the BQ default threshold
    // (BinaryQuantization.cs:92-109).
    "global_mean" -> ((s, dir) => {
      table(s, dir, "embeddings")
        .select(explode(col("embedding")).as("x"))
        .agg(round(avg(col("x")), 6).as("global_mean"))
    }),

    // All five reference metrics over consecutive-id vector pairs —
    // the scalar-function library exercised end to end (SURVEY §2.7).
    "dist_pairs_metrics" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val a = e.select(col("vec_id"), col("embedding").as("va"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("vb"))
      a.join(b, "vec_id")
        .select(col("vec_id"),
          round(Distances.euclidean(col("va"), col("vb")), 6).as("eucl"),
          round(Distances.cosineSimilarity(col("va"), col("vb")), 6).as("cos_sim"),
          round(Distances.manhattan(col("va"), col("vb")), 6).as("manh"),
          round(Distances.chebyshev(col("va"), col("vb")), 6).as("cheb"),
          round(Distances.minkowski3(col("va"), col("vb")), 6).as("mink"))
    }),

    // Cosine kNN — bug-compatible: the metric returns SIMILARITY but the
    // engine sorts ascending uniformly, so the "nearest" list is actually
    // least-similar-first (CosineSimilarityCalculator.cs:8-23 + SURVEY §2.7).
    "knn_cosine" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Knn.single(e.crossJoin(broadcast(q)), "vec_id", "embedding", col("qv"), k = 10, metric = "cosine")
    }),

    // Metric plumbing through the kNN path (pluggable IDistanceCalculator).
    "knn_manhattan" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Knn.single(e.crossJoin(broadcast(q)), "vec_id", "embedding", col("qv"), k = 10, metric = "manhattan")
    }),

    // Brute-force cosine ANN baseline (build brief: similarity search over
    // an embedding column) — the CORRECTED 1-cos metric, ascending, so
    // nearest-first; the reference-quirk variant is knn_cosine above.
    "ann_cosine_topk" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Knn.single(e.crossJoin(broadcast(q)), "vec_id", "embedding", col("qv"),
        k = 10, metric = "cosine_distance")
    }),

    // Magnitude of every vector (Vector.cs:270-273).
    "vec_magnitude" -> ((s, dir) =>
      table(s, dir, "embeddings")
        .select(col("vec_id"), round(Distances.magnitude(col("embedding")), 6).as("mag"))),

    // Element-wise add/subtract/scalar-divide (Vector.cs:209-319), reduced
    // to scalar magnitudes for engine-stable comparison.
    "vec_arith" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val a = e.select(col("vec_id"), col("embedding").as("va"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("vb"))
      a.join(b, "vec_id")
        .select(col("vec_id"),
          round(Distances.magnitude(VectorArithmetic.add(col("va"), col("vb"))), 6).as("mag_add"),
          round(Distances.magnitude(VectorArithmetic.subtract(col("va"), col("vb"))), 6).as("mag_sub"),
          round(Distances.magnitude(VectorArithmetic.divide(col("va"), 2.0)), 6).as("mag_half"))
    }),

    // Threshold filter, non-bypass case: dim 64 > 50 but threshold 1.2 ≤ 1.5
    // → plain dist <= threshold (SearchService.cs:171-189).
    "knn_threshold" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val top = Knn.single(e.crossJoin(broadcast(q)), "vec_id", "embedding", col("qv"), k = 20)
      ThresholdFilter(top, "dist", threshold = 1.2, dim = 64)
    }),

    // Threshold high-dim bypass: manhattan distances ≈ 8-10 (> 5.0) and
    // threshold 1.6 > 1.5 with dim 64 > 50 → the filter is skipped and all
    // k rows survive (the reference's documented quirk).
    "knn_threshold_bypass" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val top = Knn.single(e.crossJoin(broadcast(q)), "vec_id", "embedding", col("qv"),
        k = 10, metric = "manhattan")
      ThresholdFilter(top, "dist", threshold = 1.6, dim = 64)
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

    "knn_batch_100" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 100),
         |d AS (SELECT q.query_id AS query_id, e.vec_id AS vec_id, ${sqlEuclid("e.embedding", "q.qv")} AS dist
         |      FROM embeddings e CROSS JOIN q)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, dist
         |FROM (SELECT query_id, vec_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
         |      FROM d)
         |WHERE rank <= 10""".stripMargin,

    "range_euclidean" ->
      s"""SELECT vec_id, dist FROM (
         |  SELECT e.vec_id AS vec_id, $knnDist AS dist
         |  FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q)
         |WHERE dist <= 1.25 ORDER BY dist, vec_id""".stripMargin,

    "centroid_by_label" ->
      """SELECT label, i - 1 AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS avg_val
        |FROM embeddings, generate_series(1, 64) t(i)
        |GROUP BY label, i""".stripMargin,

    "ball_radius" ->
      """WITH c AS (SELECT label, i AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS v
        |           FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i),
        |cent AS (SELECT label, list(v ORDER BY pos) AS centroid FROM c GROUP BY label),
        |d AS (SELECT e.label AS label,
        |        round(sqrt(list_reduce(list_transform(list_zip(e.embedding, cent.centroid),
        |          p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])),
        |          (x,y) -> x+y)), 6) AS dd
        |      FROM embeddings e JOIN cent ON e.label = cent.label)
        |SELECT label, max(dd) AS radius FROM d GROUP BY label""".stripMargin,

    "global_mean" ->
      """SELECT round(avg(CAST(u AS DOUBLE)), 6) AS global_mean
        |FROM (SELECT unnest(embedding) AS u FROM embeddings)""".stripMargin,

    "dist_pairs_metrics" ->
      s"""SELECT e1.vec_id AS vec_id,
         | ${sqlEuclid("e1.embedding", "e2.embedding")} AS eucl,
         | ${sqlCosineSim("e1.embedding", "e2.embedding")} AS cos_sim,
         | ${sqlManhattan("e1.embedding", "e2.embedding")} AS manh,
         | ${sqlChebyshev("e1.embedding", "e2.embedding")} AS cheb,
         | ${sqlMinkowski3("e1.embedding", "e2.embedding")} AS mink
         |FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1""".stripMargin,

    "knn_cosine" ->
      s"""SELECT e.vec_id AS vec_id, ${sqlCosineSim("e.embedding", "q.qv")} AS dist
         |FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "knn_manhattan" ->
      s"""SELECT e.vec_id AS vec_id, ${sqlManhattan("e.embedding", "q.qv")} AS dist
         |FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    // `+ 0` folds IEEE -0.0 (self-match, cos microscopically above 1) to
    // +0.0, matching Spark's round output
    "ann_cosine_topk" ->
      s"""SELECT e.vec_id AS vec_id, round(1.0 - ${sqlCosineSimRaw("e.embedding", "q.qv")}, 6) + 0 AS dist
         |FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "vec_magnitude" ->
      s"""SELECT vec_id, round(${sqlMagnitude("embedding")}, 6) AS mag FROM embeddings""".stripMargin,

    "vec_arith" ->
      s"""SELECT e1.vec_id AS vec_id,
         | round(sqrt(${sqlZipSum("e1.embedding", "e2.embedding", s"($dElem1 + $dElem2) * ($dElem1 + $dElem2)")}), 6) AS mag_add,
         | round(sqrt(${sqlZipSum("e1.embedding", "e2.embedding", s"($dElem1 - $dElem2) * ($dElem1 - $dElem2)")}), 6) AS mag_sub,
         | round(sqrt(list_reduce(list_transform(e1.embedding, q -> (CAST(q AS DOUBLE)/2.0) * (CAST(q AS DOUBLE)/2.0)), (x,y) -> x+y)), 6) AS mag_half
         |FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1""".stripMargin,

    "knn_threshold" ->
      s"""WITH top AS (
         |  SELECT e.vec_id AS vec_id, $knnDist AS dist
         |  FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |  ORDER BY dist, vec_id LIMIT 20)
         |SELECT vec_id, dist FROM top WHERE dist <= 1.2""".stripMargin,

    "knn_threshold_bypass" ->
      s"""WITH top AS (
         |  SELECT e.vec_id AS vec_id, ${sqlManhattan("e.embedding", "q.qv")} AS dist
         |  FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |  ORDER BY dist, vec_id LIMIT 10)
         |SELECT vec_id, dist FROM top
         |WHERE (SELECT max(dist) FROM top) > 5.0 OR dist <= 1.6""".stripMargin)
}
