package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import sqlImplicits._

  // plane5 fixture (reference Tests/KDTreeTests.cs:40-48): query (0.5,0.5),
  // k=3 → results ⊆ {origin,right,up,diagonal}, never `opposite`.
  private val plane5 = Seq(
    (1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0f, 1f)),
    (4L, Array(1f, 1f)), (5L, Array(-1f, -1f)))

  test("single-query kNN on plane5 never returns the opposite corner") {
    val df = plane5.toDF("id", "values")
    val q = typedLit(Array(0.5f, 0.5f))
    val got = Knn.single(df, "id", "values", q, k = 3).collect()
    assert(got.length === 3)
    val ids = got.map(_.getLong(0)).toSet
    assert(!ids.contains(5L))
    assert(ids.subsetOf(Set(1L, 2L, 3L, 4L)))
    // all four candidates are equidistant (sqrt(0.5)) → (dist,id) tie-break
    assert(ids === Set(1L, 2L, 3L))
  }

  test("batch kNN equals single-query kNN for each query") {
    val df = plane5.toDF("id", "values")
    val queries = Seq((10L, Array(0.5f, 0.5f)), (11L, Array(-0.9f, -0.9f)))
      .toDF("query_id", "qv")
    val got = Knn.batch(df, "id", "values", queries, "query_id", "qv", k = 2)
      .orderBy("query_id", "rank").collect()
    assert(got.length === 4)
    // query 11 is closest to `opposite` (id 5), then origin (id 1)
    val q11 = got.filter(_.getLong(0) == 11L).map(_.getLong(2)).toSeq
    assert(q11 === Seq(5L, 1L))
    // query 10: equidistant four-way tie → ids 1, 2 by tie-break
    val q10 = got.filter(_.getLong(0) == 10L).map(_.getLong(2)).toSeq
    assert(q10 === Seq(1L, 2L))
  }

  test("batch kNN carries string ids natively (no silent long cast to null)") {
    val df = plane5.map { case (i, v) => (s"uuid-$i", v) }.toDF("id", "values")
    val queries = Seq((11L, Array(-0.9f, -0.9f))).toDF("query_id", "qv")
    val got = Knn.batch(df, "id", "values", queries, "query_id", "qv", k = 2)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[String]("id")).toSeq === Seq("uuid-5", "uuid-1"))
  }

  test("range search keeps only rows within radius, ordered by (dist, id)") {
    val df = plane5.toDF("id", "values")
    val got = RangeSearch.single(df, "id", "values", typedLit(Array(0f, 0f)), radius = 1.0)
      .collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L)) // dist 0, 1, 1
    val dists = got.map(_.getDouble(1)).toSeq
    assert(dists === dists.sorted)
  }

  test("TopKAgg keeps the k smallest with (dist,id) tie-break") {
    val agg = new TopKAgg[Long](3)
    val items = Seq(Scored(2.0, 1L), Scored(1.0, 2L), Scored(3.0, 3L), Scored(1.0, 1L), Scored(0.5, 9L))
    val res = items.foldLeft(agg.zero)(agg.reduce)
    assert(res === Seq(Scored(0.5, 9L), Scored(1.0, 1L), Scored(1.0, 2L)))
    val merged = agg.merge(res, Seq(Scored(0.1, 7L)))
    assert(merged === Seq(Scored(0.1, 7L), Scored(0.5, 9L), Scored(1.0, 1L)))
  }
}
