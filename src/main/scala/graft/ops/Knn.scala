package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

import graft.functions.Distances

/** A (distance, id) candidate used by the bounded top-k aggregation;
  * generic in the id type so string-keyed tables (the facade's UUIDs)
  * keep their native ids instead of silently nulling through a cast. */
case class Scored[I](dist: Double, id: I)

/** Bounded top-k by (dist, id) — the distributed form of the reference's
  * `BoundedPriorityQueue` (Neighborly/Search/KDTree.cs:58-116). Used as a
  * partial-aggregable UDAF so each map task ships at most k rows per query
  * group instead of shuffling the whole candidate set — at 100 TB the
  * shuffle is O(queries × k), not O(vectors × queries).
  */
class TopKAgg[I: scala.reflect.runtime.universe.TypeTag](k: Int)(implicit idOrd: Ordering[I])
    extends Aggregator[Scored[I], Seq[Scored[I]], Seq[Scored[I]]] {
  private val ord: Ordering[Scored[I]] = Ordering.by(s => (s.dist, s.id))
  override def zero: Seq[Scored[I]] = Vector.empty
  // Buffer stays sorted; each update is an O(k) bounded insertion (the
  // reference's BoundedPriorityQueue push), not a re-sort.
  override def reduce(b: Seq[Scored[I]], a: Scored[I]): Seq[Scored[I]] =
    if (b.size >= k && !ord.lt(a, b.last)) b
    else {
      val idx = b.indexWhere(s => ord.lt(a, s))
      val ins = if (idx < 0) b :+ a else (b.take(idx) :+ a) ++ b.drop(idx)
      if (ins.size > k) ins.take(k) else ins
    }
  override def merge(x: Seq[Scored[I]], y: Seq[Scored[I]]): Seq[Scored[I]] = {
    // merge of two sorted runs, capped at k
    val out = Vector.newBuilder[Scored[I]]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.size || j < y.size)) {
      if (j >= y.size || (i < x.size && ord.lteq(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
      n += 1
    }
    out.result()
  }
  override def finish(r: Seq[Scored[I]]): Seq[Scored[I]] = r
  override def bufferEncoder: Encoder[Seq[Scored[I]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored[I]]]()
  override def outputEncoder: Encoder[Seq[Scored[I]]] = bufferEncoder
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
    import org.apache.spark.sql.types._
    // ids keep their native family: integral widens to long (as before),
    // strings stay strings; anything else fails loudly instead of nulling
    val (idExpr, topk) = scored.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (col(idCol).cast("long"), udaf(new TopKAgg[Long](k), Encoders.product[Scored[Long]]))
      case StringType =>
        (col(idCol), udaf(new TopKAgg[String](k), Encoders.product[Scored[String]]))
      case dt => throw new IllegalArgumentException(
        s"batch kNN id column '$idCol' must be integral or string, got $dt")
    }
    scored
      .select(col(queryIdCol), col("dist"), idExpr.as("id"))
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
