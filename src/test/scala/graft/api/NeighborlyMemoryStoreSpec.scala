package graft.api

import graft.SparkSpec
import graft.core.VectorRecord

/** Mirrors the observable contract of
  * Adapters.SemanticKernel/NeighborlyMemoryStore.cs, including its quirks
  * (see the adapter scaladoc). */
class NeighborlyMemoryStoreSpec extends SparkSpec {

  private def freshStore(): NeighborlyMemoryStore = {
    val db = new NeighborlySpark(spark, 4)
    db.addVector(VectorRecord("00000000-0000-0000-0000-000000000001",
      Array(0f, 0f, 0f, 0f), original_text = "origin"))
    db.addVector(VectorRecord("00000000-0000-0000-0000-000000000002",
      Array(3f, 0f, 0f, 0f), original_text = "far"))
    new NeighborlyMemoryStore(db)
  }

  private def rec(key: String, vec: Array[Float], text: String, desc: String = "") =
    MemoryRecord(MemoryRecordMeta(isReference = true, id = key, text = text,
      description = desc), vec, key)

  test("collections are tags: create/exists/list/delete") {
    val s = freshStore()
    s.createCollection("memories")
    assert(s.doesCollectionExist("memories"))
    assert(s.doesCollectionExist("MEMORIES")) // tag normalization
    assert(s.getCollections === Seq("memories"))
    s.deleteCollection("memories")
    assert(!s.doesCollectionExist("memories"))
  }

  test("upsert ALWAYS inserts a new vector (bug-compatible) and returns key-or-new-id") {
    val s = freshStore()
    val before = s.db.count
    val validKey = "00000000-0000-0000-0000-00000000beef"
    assert(s.upsert("c", rec(validKey, Array(1f, 1f, 1f, 1f), "x")) === validKey)
    // the RETURNED key is the caller's, but the stored row has a fresh id
    assert(s.db.getVector(validKey).isEmpty)
    val newId = s.upsert("c", rec("not-a-guid", Array(2f, 2f, 2f, 2f), "y"))
    assert(newId.length === 36 && s.db.getVector(newId).isDefined)
    assert(s.db.count === before + 2)
    // upserting the identical record twice grows the store again
    s.upsert("c", rec(validKey, Array(1f, 1f, 1f, 1f), "x"))
    assert(s.db.count === before + 3)
  }

  test("get by key round-trips; malformed keys throw; absent keys are None") {
    val s = freshStore()
    val got = s.get("00000000-0000-0000-0000-000000000001").get
    assert(got.metadata.text === "origin" && got.embedding.toSeq === Seq(0f, 0f, 0f, 0f))
    assert(s.get("00000000-0000-0000-0000-0000000000aa").isEmpty)
    intercept[IllegalArgumentException] { s.get("nope") }
    assert(s.get("collection-ignored", "00000000-0000-0000-0000-000000000001").isDefined)
  }

  test("store() registers description tags but does NOT persist the vector (bug-compatible)") {
    val s = freshStore()
    val before = s.db.count
    s.store("k", rec("k", Array(9f, 9f, 9f, 9f), "text", desc = "alpha,beta"))
    assert(s.db.count === before) // FirstOrDefault is a query, not an add
    assert(s.db.tags.contains("alpha") && s.db.tags.contains("beta"))
  }

  test("getNearestMatches orders by facade search and scores everything -Infinity") {
    val s = freshStore()
    val out = s.getNearestMatches("ignored", Array(0f, 0f, 0f, 0f), 2,
      minRelevanceScore = 0.99) // ignored, like the reference
    // the facade's default 0.5 similarity threshold applies (VectorDatabase
    // .Search(query, k, method, 0.5f) — the "far" vector at dist 3 drops)
    assert(out.map(_._1.key) === Seq("00000000-0000-0000-0000-000000000001"))
    assert(out.forall(_._2.isNegInfinity))
    val one = s.getNearestMatch("ignored", Array(3f, 0f, 0f, 0f)).get
    assert(one._1.metadata.text === "far")
  }

  test("remove / batch verbs / keys enumeration") {
    val s = freshStore()
    assert(s.getKeys.toSet.size === 2)
    s.removeFromCollection("c", "00000000-0000-0000-0000-000000000002")
    assert(s.getKeys === Seq("00000000-0000-0000-0000-000000000001"))
    val ids = s.upsertBatch("c", Seq(
      rec("not-a-guid", Array(1f, 0f, 0f, 0f), "a"),
      rec("also-not", Array(0f, 1f, 0f, 0f), "b")))
    assert(ids.length === 2)
    assert(s.getBatch("c", ids).map(_.metadata.text).sorted === Seq("a", "b"))
    s.removeBatch("c", ids)
    assert(s.getKeys === Seq("00000000-0000-0000-0000-000000000001"))
  }

  test("upsertBatch/removeBatch for a 100-key batch run O(1) Spark jobs (one plan rewrite each)") {
    val s = freshStore()
    val group = s"graft.test.bulk.${Integer.toHexString(System.identityHashCode(s))}"
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(j.properties).exists(p => group == p.getProperty("spark.jobGroup.id")))
          jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "bulk SK verbs")
      val recs = (1 to 100).map(i => rec("not-a-guid", Array(i.toFloat, 0f, 0f, 0f), s"t$i"))
      val ids = s.upsertBatch("c", recs)
      assert(ids.length === 100 && ids.forall(_.length === 36))
      s.removeBatch("c", ids)
      assert(s.db.count === 2) // fixture rows survive; this count is the only action
      spark.sparkContext.clearJobGroup()
      // drain the async listener bus (poll until the counter is stable)
      val deadline = System.nanoTime() + 5e9.toLong
      var last = -1L
      while (System.nanoTime() < deadline &&
        { val c = jobs.get(); val changed = c != last; last = c; if (changed) Thread.sleep(100); changed }) ()
      // per-key loops would run ≥100 existence jobs; the bulk verbs are
      // lazy plan rewrites — the work submitted is the final count,
      // removeBatch's ONE bounded existence probe (the all-absent-batch
      // no-op guarantee), and possible AQE/broadcast helpers. O(1) in
      // the key count either way.
      assert(jobs.get() >= 1 && jobs.get() <= 5, s"bulk verbs ran ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("no-arg listing verbs are capped; the paged overload serves past the cap") {
    val db = new NeighborlySpark(spark, 4)
    (1 to 4).foreach(i => db.addVector(VectorRecord("", Array(i.toFloat, 0f, 0f, 0f))))
    val s = new NeighborlyMemoryStore(db, maxListedRecords = 3)
    val eVec = intercept[IllegalArgumentException] { s.getVectors }
    assert(eVec.getMessage.contains("getVectors(offset, limit)"))
    val eKeys = intercept[IllegalArgumentException] { s.getKeys }
    assert(eKeys.getMessage.contains("page"))
    assert(s.getVectors(0, 10).size === 4) // paging is the sanctioned path
    val small = new NeighborlyMemoryStore(db, maxListedRecords = 4)
    assert(small.getVectors.size === 4) // at the cap is still served
  }

  test("tag id reuse after removal throws like Dictionary.Add (VectorTags parity)") {
    val s = freshStore()
    s.createCollection("a"); s.createCollection("b")
    s.deleteCollection("a")
    intercept[IllegalArgumentException] { s.createCollection("c") }
  }
}
