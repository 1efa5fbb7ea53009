package graft

import graft.index.{BinaryQuantization, Lsh, LshParams, ProductQuantization}
import graft.ops.Knn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Empty-input and boundary behavior: the reference returns empty result
  * lists for empty stores (LinearSearch/LSH/BQ/PQ all early-return on
  * Count == 0) — the distributed plans must do the same, not throw. */
class EdgeCasesSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val empty = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))

  private lazy val tiny = Seq(
    (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f))
  ).toDF("vec_id", "embedding")

  private val q = Array(1f, 0f)

  test("k greater than the table size returns all rows, ordered") {
    val out = Knn.single(tiny.crossJoin(broadcast(tiny.limit(1).select($"embedding".as("qv")))),
      "vec_id", "embedding", typedLit(q), k = 99).collect()
    assert(out.length === 3)
    assert(out.head.getAs[Long]("vec_id") === 1L)
  }

  test("exact kNN over an empty table is empty") {
    assert(Knn.single(empty, "vec_id", "embedding", typedLit(q), 5).collect().isEmpty)
  }

  test("BQ over an empty table is empty; global mean defaults to 0") {
    assert(BinaryQuantization.globalMean(empty, "embedding") === 0.0)
    assert(BinaryQuantization.search(empty, "vec_id", "embedding", q, 5).collect().isEmpty)
  }

  test("LSH over an empty table is empty (fallback sample of nothing)") {
    assert(Lsh.search(empty, "vec_id", "embedding", q, 5, LshParams(2, 4, 4)).collect().isEmpty)
  }

  test("PQ fit on empty input yields an inert model; search returns empty") {
    val m = ProductQuantization.fit(empty, "embedding")
    assert(m.numSubVectors === 0)
    assert(ProductQuantization.search(m, empty, "vec_id", "embedding", q, 5).collect().isEmpty)
  }

  test("range search with radius 0 keeps only exact matches") {
    val out = graft.ops.RangeSearch.single(tiny, "vec_id", "embedding",
      typedLit(q), radius = 0.0).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L))
  }
}
