package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import sqlImplicits._

  // two tight blobs around (0,0) and (10,10); ids 0..5
  private lazy val blobs = Seq(
    (0L, Array(0.0f, 0.1f)), (1L, Array(0.1f, 0.0f)), (2L, Array(-0.1f, 0.1f)),
    (3L, Array(10.0f, 10.1f)), (4L, Array(10.1f, 9.9f)), (5L, Array(9.9f, 10.0f))
  ).toDF("vec_id", "embedding")

  test("two blobs separate into two clusters; dist2 is the micro-exact residual") {
    val out = KMeans.assign(blobs, "vec_id", "embedding", k = 2, iterations = 3)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val c0 = (0L to 2L).map(out(_)._1).distinct
    val c1 = (3L to 5L).map(out(_)._1).distinct
    assert(c0.length === 1 && c1.length === 1 && c0.head != c1.head)
    // blob-0 centroid after convergence = mean of the three micro vecs:
    // x: (0 + 100000 - 100000) DIV 3 = 0, y: (100000 + 0 + 100000) DIV 3 = 66666
    // dist2 of vec 0 = (0-0)^2 + (100000-66666)^2 = 33334^2
    assert(out(0L)._2 === 33334L * 33334L)
  }

  test("init is the k smallest ids; zero iterations assigns against raw init vectors") {
    val out = KMeans.assign(blobs, "vec_id", "embedding", k = 2, iterations = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // centroids = vecs 0 and 1 verbatim; vec 0 -> cluster 0, vec 1 -> cluster 1,
    // both blobs-1 members land on whichever of the two is nearer
    assert(out(0L) === 0 && out(1L) === 1)
  }

  test("exact ties keep the lower cluster id") {
    // two identical init vectors -> every distance ties -> cluster 0
    val d = Seq((0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(2.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = KMeans.assign(d, "vec_id", "embedding", k = 2, iterations = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.values.forall(_ === 0))
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // k=2 over points all near the first init vector: cluster 1 empties
    // on round 1 and must keep centroid = vec 1's micro vector
    val d = Seq((0L, Array(0.0f)), (1L, Array(0.2f)), (2L, Array(0.01f)),
      (3L, Array(0.02f))).toDF("vec_id", "embedding")
    // after round 1: all points nearer c0-mean than the stale c1 except
    // the run must not crash and must keep k clusters addressable
    val centers = KMeans.train(d, "vec_id", "embedding", k = 2, iterations = 3)
    assert(centers.length === 2)
    assert(centers(1).nonEmpty) // carried, not dropped
  }

  test("assignment plan is one narrow kernel pass in codegen (no exchange)") {
    // parquet-backed: a pure Project over a LocalRelation would be
    // constant-folded away (ConvertToLocalRelation) and show no plan
    val dir = java.nio.file.Files.createTempDirectory("kmeans_plan").toString
    blobs.write.mode("overwrite").parquet(dir)
    val d = spark.read.parquet(dir)
    val centers = KMeans.train(d, "vec_id", "embedding", k = 2, iterations = 1)
    val plan = d.select(col("vec_id"),
        graft.functions.NearestCentroidExpr(col("embedding"), centers)("cluster"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*("), plan)
  }
}
