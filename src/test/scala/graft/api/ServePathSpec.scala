package graft.api

import graft.SparkSpec
import graft.core.VectorRecord

/** The warm serve fast path (r6: driver-merged index probe + one raw-RDD
  * record fetch, no Catalyst in the request path) must be observably
  * identical to the cold scan path — same rows, same (dist, id) order,
  * same threshold semantics INCLUDING the high-dimension bypass quirk
  * (SearchService.cs:171-189), which the fast path applies via
  * `ThresholdFilter.applyLocal` (one source of truth, same comparisons). */
class ServePathSpec extends SparkSpec {

  private val dim = 64 // > 50: the bypass quirk is reachable
  private def vec(x: Float) = Array.tabulate(dim)(i => if (i == 0) x else 0f)

  private def ids(db: NeighborlySpark, q: Array[Float], k: Int, thr: Double) =
    db.searchRecords(q, k, similarityThreshold = thr).map { case (r, d) => (r.id, d) }

  test("warm fast path ≡ cold path: rows, order, threshold, and the high-dim bypass") {
    val db = new NeighborlySpark(spark, dim)
    try {
      (1 to 30).foreach(i => db.addVector(
        VectorRecord(f"v$i%02d", vec(i.toFloat), Array(i.toShort), s"text-$i")))
      val near = vec(0.5f); val far = vec(100f)

      // cold first (no index yet): the scan path is the oracle
      assert(!db.hasWarmIndexes)
      val coldNear = ids(db, near, 5, 0.6)
      val coldStrict = ids(db, vec(1.0f), 5, 0.0)
      val coldBypass = ids(db, far, 3, 2.0)

      db.buildAllIndexes()
      assert(db.hasWarmIndexes)
      assert(ids(db, near, 5, 0.6) === coldNear)
      assert(coldNear.map(_._1) === Seq("v01")) // only dist 0.5 ≤ 0.6
      // exact-threshold boundary: dist 0.0 ≤ 0.0 keeps exactly the match
      assert(ids(db, vec(1.0f), 5, 0.0) === coldStrict)
      assert(coldStrict.map(_._1) === Seq("v01"))
      // bypass: dim > 50, threshold > 1.5, max dist ≈ 70 > 5 → filter
      // skipped, all k hits survive on BOTH paths
      val warmBypass = ids(db, far, 3, 2.0)
      assert(warmBypass === coldBypass)
      assert(warmBypass.size === 3, "bypass must keep all k hits")

      // the RDD fetch carries the FULL record (tags/text), not a projection
      val rec = db.searchRecords(near, 1, similarityThreshold = 0.6).head._1
      assert(rec.tags.toSeq === Seq(1.toShort) && rec.original_text === "text-1")

      // k beyond the qualifying set truncates identically
      assert(ids(db, near, 50, 1000.0).size === 30)

      // HNSW warm: the records path and the DataFrame path answer from
      // the same graph — identical hits
      val viaRecords = db.searchRecords(near, 4, SearchAlgorithm.HNSW, 1000.0)
        .map { case (r, d) => (r.id, d) }
      val viaFrame = db.search(near, 4, SearchAlgorithm.HNSW, 1000.0)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(viaRecords === viaFrame)
    } finally db.close()
  }
}
