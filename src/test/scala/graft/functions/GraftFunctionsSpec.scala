package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("kernels are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        | graft_euclidean(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS e,
        | graft_manhattan(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS m,
        | graft_magnitude(array(3.0F, 4.0F)) AS mag,
        | graft_hamming_packed(array(255L), array(15L)) AS h,
        | graft_cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - math.sqrt(27.0)) < 1e-12)
    assert(r.getDouble(1) === 9.0)
    assert(r.getDouble(2) === 5.0)
    assert(r.getLong(3) === 4L)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  test("SQL functions participate in full queries over tables") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    val rows = spark.sql(
      """SELECT e.vec_id, graft_euclidean(e.embedding, q.embedding) AS d
        |FROM emb_sql e, (SELECT embedding FROM emb_sql WHERE vec_id = 0) q
        |ORDER BY d, e.vec_id LIMIT 3""".stripMargin).collect()
    assert(rows.length === 3)
    assert(rows.head.getLong(0) === 0L && rows.head.getDouble(1) === 0.0)
  }
}
