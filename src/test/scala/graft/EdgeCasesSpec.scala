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

  test("LocalAnn / LocalHnsw over an empty table are empty; k > n returns all") {
    val emptyIdx = graft.index.LocalAnn.build(empty, "vec_id", "embedding")
    assert(graft.index.LocalAnn.search(emptyIdx, spark, q, 5, "vec_id").collect().isEmpty)
    val emptyH = graft.index.LocalHnsw.build(empty, "vec_id", "embedding")
    assert(graft.index.LocalHnsw.search(emptyH, spark, q, 5, "vec_id").collect().isEmpty)
    val idx = graft.index.LocalAnn.build(tiny, "vec_id", "embedding")
    assert(graft.index.LocalAnn.search(idx, spark, q, 99, "vec_id").collect().length === 3)
    val h = graft.index.LocalHnsw.build(tiny, "vec_id", "embedding")
    assert(graft.index.LocalHnsw.search(h, spark, q, 99, "vec_id").collect().length === 3)
    Seq(emptyIdx, idx).foreach(_.unpersist()); Seq(emptyH, h).foreach(_.unpersist())
  }

  test("IVF sampled-centroid fit on tiny/empty input stays sane") {
    val m = graft.index.Ivf.fitSampledCentroids(tiny, "vec_id", "embedding", nlist = 16)
    assert(m.nlist === 3) // nlist capped at table size
    val out = graft.index.Ivf.search(m, tiny, "vec_id", "embedding", q, k = 2, nprobe = 3)
    assert(out.collect().length === 2)
    val e = graft.index.Ivf.fitSampledCentroids(empty, "vec_id", "embedding", nlist = 4)
    assert(e.nlist === 0)
  }

  test("near-dup operators over an empty corpus are empty, not errors") {
    val docs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    assert(graft.pipeline.Dedup.minHashNearDuplicates(docs, "doc_id", "text", 0.5).collect().isEmpty)
    assert(graft.pipeline.Dedup.simHashNearDuplicates(docs, "doc_id", "text").collect().isEmpty)
    assert(graft.pipeline.Dedup.cosineNearDuplicates(empty, "vec_id", "embedding",
      0.5, LshParams.serving(2)).collect().isEmpty)
  }

  test("served API on an empty store: search 200 with [], get/delete 404") {
    val db = new graft.api.NeighborlySpark(spark, 2)
    val srv = new graft.api.VectorHttpServer(db)
    val port = srv.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def send(method: String, path: String, body: String) = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$path"))
          .method(method, java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val hits = send("POST", "/vectors/searchNearest?k=3", """{"values":[0.0,0.0]}""")
      assert(hits.statusCode() === 200 && hits.body() === "[]")
      assert(send("GET", "/vector/none", "").statusCode() === 404)
      assert(send("DELETE", "/vector/none", "").statusCode() === 404)
    } finally srv.stop()
  }

  test("range search with radius 0 keeps only exact matches") {
    val out = graft.ops.RangeSearch.single(tiny, "vec_id", "embedding",
      typedLit(q), radius = 0.0).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L))
  }

  test("components over empty pair sets are empty on both engines") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.pipeline.Dedup.connectedComponents(noPairs, "id_a", "id_b").count() === 0L)
    assert(graft.pipeline.Dedup.connectedComponents(
      noPairs, "id_a", "id_b", algorithm = "propagation").count() === 0L)
    // cosineComponents over a dup-free corpus: no pairs, no self-quals → empty
    val comps = graft.pipeline.Dedup.cosineComponents(
      tiny, "vec_id", "embedding", 0.000001, LshParams.serving(2))
    assert(comps.count() === 0L)
  }

  test("RRF fusion with disjoint pools keeps both sides; empty pools are empty") {
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((9L, 1)).toDF("doc_id", "rank")
    val fused = graft.pipeline.HybridSearch.rrfFuse(a, b, "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // both rank-1 entries tie at 1/61 (round 6), id breaks the tie
    assert(fused.map(_._1).toSeq === Seq(1L, 9L, 2L))
    assert(fused(0)._2 === fused(1)._2)
    val none = Seq.empty[(Long, Int)].toDF("doc_id", "rank")
    assert(graft.pipeline.HybridSearch.rrfFuse(none, none, "doc_id", 5).count() === 0L)
  }

  test("IVF batch search with an empty query set is empty; single query matches Ivf.search") {
    val m = graft.index.Ivf.fitSampledCentroids(tiny, "vec_id", "embedding", nlist = 2)
    val noQ = Seq.empty[(Long, Array[Float])].toDF("query_id", "qv")
    assert(graft.index.Ivf.searchBatch(m, tiny, "vec_id", "embedding",
      noQ, "query_id", "qv", k = 2, nprobe = 2).count() === 0L)
    val oneQ = Seq((7L, q)).toDF("query_id", "qv")
    val batch = graft.index.Ivf.searchBatch(m, tiny, "vec_id", "embedding",
      oneQ, "query_id", "qv", k = 2, nprobe = 2)
      .orderBy($"rank").collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist"))).toSeq
    val single = graft.index.Ivf.search(m, tiny, "vec_id", "embedding", q, k = 2, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist"))).toSeq
    assert(batch === single)
  }
}
