package graft.index

import graft.SparkSpec
import graft.ops.Knn
import org.apache.spark.sql.functions._

class LocalAnnSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("indexed search equals brute-force exact kNN for many queries") {
    val idx = LocalAnn.build(emb, "vec_id", "embedding")
    (0L until 10L).foreach { qid =>
      val q = emb.filter($"vec_id" === qid).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toArray
      val got = LocalAnn.search(idx, spark, q, 10, "vec_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exact = Knn.single(
        emb.crossJoin(broadcast(emb.filter($"vec_id" === qid).select($"embedding".as("qv")))),
        "vec_id", "embedding", $"qv", k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === exact, s"query $qid")
    }
    idx.unpersist()
  }

  test("results are identical at any partitioning (parts x k merge is exact)") {
    val q = emb.filter($"vec_id" === 3).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toArray
    val a = LocalAnn.search(LocalAnn.build(emb.repartition(7), "vec_id", "embedding"),
      spark, q, 10, "vec_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = LocalAnn.search(LocalAnn.build(emb.repartition(2), "vec_id", "embedding"),
      spark, q, 10, "vec_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b)
  }

  test("norm pruning skips most of a norm-spread corpus (and stays exact)") {
    val rnd = new scala.util.Random(11)
    // 10 shells of very different magnitude: norm ordering separates them
    val rows = (0 until 2000).map { i =>
      val shell = 1 + (i % 10) * 10
      (i.toLong, Array.fill(8)((rnd.nextFloat() * 0.1f + 1f) * shell))
    }
    val df = rows.toDF("vec_id", "embedding")
    val idx = LocalAnn.build(df.repartition(1), "vec_id", "embedding")
    val q = rows(15)._2 // inside shell 1+50=51... some mid shell
    val (top, evaluated) = idx.collect().head.topKWithStats(q, 10)
    assert(top.length === 10)
    info(s"evaluated $evaluated of 2000")
    assert(evaluated < 1000, s"pruning ineffective: $evaluated of 2000 evaluated")
    // exactness under pruning
    val exact = Knn.single(
      df.crossJoin(broadcast(df.filter($"vec_id" === 15).select($"embedding".as("qv")))),
      "vec_id", "embedding", $"qv", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top.map(t => (t._1, t._2)).sortBy(t => (t._2, t._1)) === exact.map(t => (t._1, t._2)).sortBy(t => (t._2, t._1)))
    idx.unpersist()
  }

  test("warm-index queries are cheap relative to the full scan pipeline") {
    val idx = LocalAnn.build(emb, "vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toArray
    LocalAnn.search(idx, spark, q, 10, "vec_id").collect() // warm
    val t0 = System.nanoTime()
    (1 to 5).foreach(_ => LocalAnn.search(idx, spark, q, 10, "vec_id").collect())
    val perQuery = (System.nanoTime() - t0) / 5 / 1e6
    info(f"warm indexed single query: $perQuery%.1f ms")
    assert(perQuery < 100.0, f"single-query latency $perQuery%.1f ms ≥ 100 ms bound")
    idx.unpersist()
  }
}
