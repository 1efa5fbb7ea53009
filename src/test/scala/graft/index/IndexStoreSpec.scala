package graft.index

import graft.SparkSpec

class IndexStoreSpec extends SparkSpec {

  private val dir = s"${System.getProperty("java.io.tmpdir")}/graft_indexstore"
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("LSH params round-trip and regenerate identical projections") {
    val p = LshParams.adaptive(64)
    IndexStore.saveLsh(spark, p, dir)
    val loaded = IndexStore.loadLsh(spark, dir)
    assert(loaded === p)
    assert(loaded.projections(0).toSeq === p.projections(0).toSeq)
  }

  test("BQ threshold round-trips") {
    IndexStore.saveBqThreshold(spark, 0.123456789, dir)
    assert(IndexStore.loadBqThreshold(spark, dir) === 0.123456789)
  }

  test("IVF centers round-trip with identical assignments") {
    val m = Ivf.fitSampledCentroids(emb, "vec_id", "embedding", nlist = 8)
    IndexStore.saveIvf(spark, m, dir)
    val loaded = IndexStore.loadIvf(spark, dir)
    assert(loaded.centers.map(_.toSeq).toSeq === m.centers.map(_.toSeq).toSeq)
    val a = Ivf.assign(m, emb, "embedding").select("cluster").collect().map(_.getInt(0)).toSeq
    val b = Ivf.assign(loaded, emb, "embedding").select("cluster").collect().map(_.getInt(0)).toSeq
    assert(a === b)
  }

  test("LocalAnn index round-trips: reloaded index answers identically (build once survives restart)") {
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val built = LocalAnn.build(emb, "vec_id", "embedding")
    val before = LocalAnn.search(built, spark, q, k = 10, "vec_id").collect().toSeq
    IndexStore.saveLocalAnn(spark, built, dir)
    val loaded = IndexStore.loadLocalAnn(spark, dir)
    assert(loaded.getNumPartitions === built.mapPartitions(
      it => if (it.hasNext) Iterator.single(1) else Iterator.empty).count().toInt)
    val after = LocalAnn.search(loaded, spark, q, k = 10, "vec_id").collect().toSeq
    assert(after === before)
    loaded.unpersist(); built.unpersist()
  }

  test("HNSW graphs round-trip: reloaded graphs return identical rows (VERDICT r3 item 5)") {
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val built = LocalHnsw.build(
      emb.repartition(4, org.apache.spark.sql.functions.col("vec_id")), "vec_id", "embedding")
    val before = LocalHnsw.search(built, spark, q, k = 10, "vec_id").collect().toSeq
    IndexStore.saveHnsw(spark, built, dir)
    val loaded = IndexStore.loadHnsw(spark, dir)
    val after = LocalHnsw.search(loaded, spark, q, k = 10, "vec_id").collect().toSeq
    assert(after === before) // byte-identical graphs → identical approximate results
    loaded.unpersist(); built.unpersist()
  }

  test("PQ codebooks round-trip with identical centers and codes") {
    val m = ProductQuantization.fit(emb, "embedding")
    IndexStore.savePq(spark, m, dir)
    val loaded = IndexStore.loadPq(spark, dir)
    assert(loaded.numSubVectors === m.numSubVectors && loaded.subDim === m.subDim)
    (0 until m.numSubVectors).foreach { b =>
      assert(loaded.models(b).clusterCenters.map(_.toArray.toSeq).toSeq ===
        m.models(b).clusterCenters.map(_.toArray.toSeq).toSeq)
    }
    val a = ProductQuantization.quantize(m, emb, "embedding").select("codes").collect()
    val c = ProductQuantization.quantize(loaded, emb, "embedding").select("codes").collect()
    assert(a.map(_.getSeq[Int](0)).toSeq === c.map(_.getSeq[Int](0)).toSeq)
  }
}
