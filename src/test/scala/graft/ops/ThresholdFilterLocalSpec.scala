package graft.ops

import graft.SparkSpec

/** `ThresholdFilter.applyLocal` (the warm serve path's driver-side
  * filter) must be pointwise-identical to the SQL `ThresholdFilter` for
  * every (dists, threshold, dim) combination — any drift between the two
  * would make warm results diverge from cold exactly at the high-dim
  * bypass boundary (SearchService.cs:171-189), the quirk hardest to hit
  * by example-based tests. Randomized sweep across both sides of every
  * boundary: dim 50/51, threshold 1.5, max-dist 5.0, and empty input. */
class ThresholdFilterLocalSpec extends SparkSpec {
  import sqlImplicits._

  test("applyLocal ≡ SQL ThresholdFilter across randomized boundary-straddling inputs") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 60) {
      val n = rnd.nextInt(8) // 0..7 rows — empty input included
      val dists = Seq.fill(n)(math.floor(rnd.nextDouble() * 80) / 10.0) // 0.0..7.9, hits 5.0
      val dim = Seq(2, 50, 51, 64)(rnd.nextInt(4))
      val thr = Seq(0.0, 0.5, 1.5, 1.6, 2.0, 1000.0)(rnd.nextInt(6))
      val rows = dists.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      val sql = ThresholdFilter(rows.toDF("id", "dist"), "dist", thr, dim)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
      val local = ThresholdFilter.applyLocal(rows, thr, dim).sortBy(_._1)
      assert(local === sql, s"trial $trial dim=$dim thr=$thr dists=$dists")
    }
  }
}
