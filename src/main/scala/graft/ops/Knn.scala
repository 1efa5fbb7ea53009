package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

import graft.functions.Distances

/** A (distance, id) candidate used by the bounded top-k aggregation. */
case class Scored(dist: Double, id: Long)

/** Bounded top-k by (dist, id) — the distributed form of the reference's
  * `BoundedPriorityQueue` (Neighborly/Search/KDTree.cs:58-116). Used as a
  * partial-aggregable UDAF so each map task ships at most k rows per query
  * group instead of shuffling the whole candidate set — at 100 TB the
  * shuffle is O(queries × k), not O(vectors × queries).
  */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private val ord: Ordering[Scored] = Ordering.by(s => (s.dist, s.id))
  override def zero: Seq[Scored] = Vector.empty
  // Buffer stays sorted; each update is an O(k) bounded insertion (the
  // reference's BoundedPriorityQueue push), not a re-sort.
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size >= k && !ord.lt(a, b.last)) b
    else {
      val idx = b.indexWhere(s => ord.lt(a, s))
      val ins = if (idx < 0) b :+ a else (b.take(idx) :+ a) ++ b.drop(idx)
      if (ins.size > k) ins.take(k) else ins
    }
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = {
    // merge of two sorted runs, capped at k
    val out = Vector.newBuilder[Scored]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.size || j < y.size)) {
      if (j >= y.size || (i < x.size && ord.lteq(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
      n += 1
    }
    out.result()
  }
  override def finish(r: Seq[Scored]): Seq[Scored] = r
  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
}

/** Exact (brute-force) k-nearest-neighbor search — the reference's
  * `LinearSearch` semantics (Neighborly/Search/LinearSearch.cs:10-42):
  * all distances, ascending sort, take k; deterministic `(dist, id)`
  * tie-break adopted everywhere (KDTree.cs:381-386 orders range results the
  * same way).
  *
  * KD-tree / Ball-tree / HNSW in the reference are single-node index
  * structures whose *observable result* is this same exact top-k (recall
  * bar for HNSW aside); on Spark the exact plan IS the brute-force scan —
  * Catalyst rewrites orderBy+limit into `TakeOrderedAndProject` (a
  * distributed bounded heap). Approximate algorithms live in `graft.index`
  * (Lsh / BinaryQuantization / ProductQuantization).
  */
object Knn {

  /** Distance of every vector to one query, rounded to 6 decimals for
    * oracle-stable ordering (ties then broken by id). */
  def withDistance(vectors: DataFrame, vecCol: String, query: Column,
      metric: String = "euclidean", outCol: String = "dist"): DataFrame =
    vectors.withColumn(outCol, round(Distances.metric(metric)(col(vecCol), query), 6))

  /** Single-query exact kNN: `orderBy(dist, id).limit(k)` →
    * TakeOrderedAndProject (no full sort, no full shuffle). */
  def single(vectors: DataFrame, idCol: String, vecCol: String,
      query: Column, k: Int, metric: String = "euclidean"): DataFrame =
    withDistance(vectors, vecCol, query, metric)
      .select(col(idCol), col("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  /** Batch multi-query exact kNN. `queries(queryIdCol, queryVecCol)` is
    * broadcast against the (arbitrarily large) vector table; per-query
    * top-k runs as a partial-aggregable bounded heap, so the only shuffle
    * is the O(#queries × k) combine. Returns
    * (query_id, rank BIGINT, id, dist).
    */
  def batch(vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, metric: String = "euclidean"): DataFrame = {
    val dist = round(Distances.metric(metric)(col(vecCol), col(queryVecCol)), 6)
    batchOver(
      vectors
        .crossJoin(broadcast(queries.select(col(queryIdCol), col(queryVecCol))))
        .withColumn("dist", dist),
      idCol, queryIdCol, k)
  }

  /** Per-query bounded top-k over a prepared (queryId, id, dist) frame —
    * the shared tail of exact-batch and LSH-batch search. Shuffle is
    * O(#queries × k) thanks to the partial-aggregable bounded heap.
    * Returns (query_id, rank BIGINT, id, dist). */
  def batchOver(scored: DataFrame, idCol: String, queryIdCol: String, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[Scored])
    scored
      .select(col(queryIdCol), col("dist"), col(idCol).cast("long").as("id"))
      .groupBy(col(queryIdCol))
      .agg(topk(col("dist"), col("id")).as("nn"))
      .select(col(queryIdCol), posexplode(col("nn")))
      .select(
        col(queryIdCol),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol),
        col("col.dist").as("dist"))
  }
}

/** Exact range (radius) search — `LinearRangeSearch` semantics
  * (Neighborly/Search/LinearRangeSearch.cs:19-55): keep `dist <= radius`,
  * order by (distance, id) (KDTree.cs:381-386,408-413).
  */
object RangeSearch {
  def single(vectors: DataFrame, idCol: String, vecCol: String,
      query: Column, radius: Double, metric: String = "euclidean"): DataFrame =
    Knn.withDistance(vectors, vecCol, query, metric)
      .filter(col("dist") <= radius)
      .select(col(idCol), col("dist"))
      .orderBy(col("dist"), col(idCol))
}
