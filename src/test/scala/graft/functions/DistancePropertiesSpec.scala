package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metric-space properties over seed-42 random vectors (an upgrade the
  * reference's test suite lacks — SURVEY §5). Checked in one Spark pass
  * over a batch of generated pairs rather than per-case jobs. */
class DistancePropertiesSpec extends SparkSpec {
  import sqlImplicits._

  private val rnd = new scala.util.Random(42)
  private def vec(d: Int) = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
  private val triples = Seq.fill(60)((vec(16), vec(16), vec(16)))
  private lazy val df = triples.toDF("a", "b", "c").cache()

  private val trueMetrics = Seq("euclidean", "manhattan", "chebyshev", "minkowski")

  test("symmetry: d(a,b) == d(b,a)") {
    for (m <- trueMetrics :+ "cosine") {
      val f = Distances.metric(m)
      val bad = df.filter(abs(f(col("a"), col("b")) - f(col("b"), col("a"))) > 1e-9).count()
      assert(bad === 0, s"$m symmetry")
    }
  }

  test("identity: d(a,a) == 0 and non-negativity") {
    for (m <- trueMetrics) {
      val f = Distances.metric(m)
      assert(df.filter(abs(f(col("a"), col("a"))) > 1e-9).count() === 0, s"$m identity")
      assert(df.filter(f(col("a"), col("b")) < 0.0).count() === 0, s"$m non-negative")
    }
  }

  test("triangle inequality for euclidean and manhattan") {
    for (m <- Seq("euclidean", "manhattan")) {
      val f = Distances.metric(m)
      val bad = df.filter(
        f(col("a"), col("c")) > f(col("a"), col("b")) + f(col("b"), col("c")) + 1e-9).count()
      assert(bad === 0, s"$m triangle")
    }
  }

  test("cosine similarity bounded in [-1, 1]") {
    val f = Distances.metric("cosine")
    val bad = df.filter(abs(f(col("a"), col("b"))) > 1.0 + 1e-9).count()
    assert(bad === 0)
  }

  test("euclidean dominates chebyshev, manhattan dominates euclidean") {
    val bad1 = df.filter(
      Distances.chebyshev(col("a"), col("b")) > Distances.euclidean(col("a"), col("b")) + 1e-9).count()
    val bad2 = df.filter(
      Distances.euclidean(col("a"), col("b")) > Distances.manhattan(col("a"), col("b")) + 1e-9).count()
    assert(bad1 === 0 && bad2 === 0)
  }
}
