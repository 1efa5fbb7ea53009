package graft.functions

import graft.SparkSpec
import graft.index.IvfModel
import org.apache.spark.sql.functions._

/** [[TopCellsExpr]] — the codegen top-p coarse-cell assignment that
  * blocks IVF-based semantic dedup. Parity matrix: generated vs
  * interpreted paths, [[IvfModel.probes]]' (dist, cid) order, and the
  * `p = 1` ≡ [[ArgMinDistExpr]] degenerate case. */
class TopCellsSpec extends SparkSpec {
  import sqlImplicits._

  private val centers: Array[Array[Float]] = Array(
    Array(0f, 0f), Array(1f, 0f), Array(0f, 1f), Array(2f, 2f))

  test("matches IvfModel.probes order for p = 1..nlist, ties to lower cid") {
    val model = IvfModel(centers)
    val vecs = Seq(
      Seq(0.1f, 0.1f), Seq(0.9f, 0.1f), Seq(0.5f, 0.5f), // equidistant to 3 cells
      Seq(2f, 2f), Seq(-5f, 7f))
    for (p <- 1 to centers.length; v <- vecs) {
      val viaExpr = Seq(Tuple1(v)).toDF("v")
        .select(TopCellsExpr($"v", centers, p).as("c"))
        .head().getSeq[Int](0)
      assert(viaExpr === model.probes(v.toArray, p),
        s"p=$p v=$v: expr $viaExpr != probes ${model.probes(v.toArray, p)}")
    }
  }

  test("p = 1 equals ArgMinDistExpr and p >= nlist returns every cell once") {
    val d = spark.range(64).select(
      array((col("id") % 7).cast("float"), (col("id") % 5).cast("float")).as("v"))
    val both = d.select(
      TopCellsExpr($"v", centers, 1).as("top"),
      ArgMinDistExpr($"v", centers).as("am")).collect()
    assert(both.forall(r => r.getSeq[Int](0) === Seq(r.getInt(1))))
    val all = d.select(TopCellsExpr($"v", centers, 9).as("top")).collect()
    assert(all.forall(_.getSeq[Int](0).sorted == Seq(0, 1, 2, 3)))
  }

  test("p < 1 fails fast") {
    intercept[IllegalArgumentException](TopCellsExpr($"v", centers, 0))
  }
}
