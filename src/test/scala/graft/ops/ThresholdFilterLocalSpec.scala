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
    for (trial <- 1 to 80) {
      val n = rnd.nextInt(8) // 0..7 rows — empty input included
      // 0.0..7.9 (hits the 5.0 boundary); ~6% NaN rows exercise Spark's
      // NaN-sorts-greatest rule inside the bypass condition
      val dists = Seq.fill(n)(
        if (rnd.nextInt(16) == 0) Double.NaN
        else math.floor(rnd.nextDouble() * 80) / 10.0)
      val dim = Seq(2, 50, 51, 64)(rnd.nextInt(4))
      val thr = Seq(0.0, 0.5, 1.5, 1.6, 2.0, 1000.0)(rnd.nextInt(6))
      val rows = dists.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      val sql = ThresholdFilter(rows.toDF("id", "dist"), "dist", thr, dim)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
      val local = ThresholdFilter.applyLocal(rows, thr, dim).sortBy(_._1)
      // Scala's primitive tuple equality says NaN != NaN; normalize so a
      // NaN row compares equal to a NaN row
      def norm(xs: Seq[(Long, Double)]) =
        xs.map { case (i, d) => (i, d.isNaN, if (d.isNaN) 0.0 else d) }
      assert(norm(local) === norm(sql), s"trial $trial dim=$dim thr=$thr dists=$dists")
    }
  }
}
