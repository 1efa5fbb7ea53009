package graft.index

import graft.SparkSpec
import graft.ops.Knn
import org.apache.spark.sql.functions._

class LocalHnswSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("graph search recall >= 0.8 vs exact (the reference's own HNSW bar)") {
    val idx = LocalHnsw.build(emb, "vec_id", "embedding")
    val recalls = (0L until 20L).map { qid =>
      val q = emb.filter($"vec_id" === qid).head()
        .getAs[scala.collection.Seq[Float]]("embedding").toArray
      val approx = LocalHnsw.search(idx, spark, q, 10, "vec_id")
        .collect().map(_.getLong(0)).toSet
      val exact = Knn.single(
        emb.crossJoin(broadcast(emb.filter($"vec_id" === qid).select($"embedding".as("qv")))),
        "vec_id", "embedding", $"qv", k = 10)
        .collect().map(_.getLong(0)).toSet
      approx.intersect(exact).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    info(f"LocalHnsw mean recall@10: $mean%.2f")
    assert(mean >= 0.8, f"recall $mean%.2f below the 0.8 bar")
    idx.unpersist()
  }

  test("fixed partitioning reproduces identical graphs and results") {
    val part = emb.repartition(3, $"vec_id")
    val q = emb.filter($"vec_id" === 7).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toArray
    val a = LocalHnsw.search(LocalHnsw.build(part, "vec_id", "embedding"), spark, q, 10, "vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = LocalHnsw.search(LocalHnsw.build(part, "vec_id", "embedding"), spark, q, 10, "vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b)
    // self-query finds itself first at distance 0
    assert(a.head === (7L, 0.0))
  }

  test("higher ef raises recall (beam-width contract)") {
    val idx = LocalHnsw.build(emb.repartition(1), "vec_id", "embedding", m = 8, efConstruction = 40)
    def recall(ef: Int): Double = {
      val rs = (0L until 10L).map { qid =>
        val q = emb.filter($"vec_id" === qid).head()
          .getAs[scala.collection.Seq[Float]]("embedding").toArray
        val approx = LocalHnsw.search(idx, spark, q, 10, "vec_id", ef = ef)
          .collect().map(_.getLong(0)).toSet
        val exact = Knn.single(
          emb.crossJoin(broadcast(emb.filter($"vec_id" === qid).select($"embedding".as("qv")))),
          "vec_id", "embedding", $"qv", k = 10)
          .collect().map(_.getLong(0)).toSet
        approx.intersect(exact).size / 10.0
      }
      rs.sum / rs.length
    }
    val lo = recall(10); val hi = recall(200)
    info(f"recall ef=10: $lo%.2f, ef=200: $hi%.2f")
    assert(hi >= lo)
    assert(hi >= 0.9) // wide beam on a small graph is near-exact
    idx.unpersist()
  }
}
