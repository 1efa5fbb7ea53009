package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.Random

/** The codegen kernels must be bit-identical to the HOF reference forms
  * (same double widening, same left-to-right accumulation). */
class DistanceExprSpec extends SparkSpec {
  import sqlImplicits._

  private val rnd = new Random(42)
  private val pairs: Seq[(Array[Float], Array[Float])] =
    (1 to 50).map { _ =>
      val n = 1 + rnd.nextInt(128)
      (Array.fill(n)(rnd.nextFloat() * 10 - 5), Array.fill(n)(rnd.nextFloat() * 10 - 5))
    }

  private lazy val df = pairs.toDF("a", "b").cache()

  private def check(name: String, kernel: (Column, Column) => Column,
      hof: (Column, Column) => Column): Unit = {
    val rows = df.select(kernel(col("a"), col("b")).as("k"), hof(col("a"), col("b")).as("h")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"$name kernel=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("euclidean kernel ≡ HOF") { check("euclidean", Distances.euclidean, Distances.Hof.euclidean) }
  test("manhattan kernel ≡ HOF") { check("manhattan", Distances.manhattan, Distances.Hof.manhattan) }
  test("chebyshev kernel ≡ HOF") { check("chebyshev", Distances.chebyshev, Distances.Hof.chebyshev) }
  test("minkowski3 kernel ≡ HOF") { check("minkowski3", Distances.minkowski3, Distances.Hof.minkowski3) }
  test("cosine kernel ≡ HOF") { check("cosine", Distances.cosineSimilarity, Distances.Hof.cosineSimilarity) }
  test("dot kernel ≡ HOF") { check("dot", Distances.dot, Distances.Hof.dot) }

  test("magnitude kernel ≡ HOF") {
    val rows = df.select(Distances.magnitude(col("a")).as("k"), Distances.Hof.magnitude(col("a")).as("h")).collect()
    rows.foreach(r => assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0))
  }

  test("hammingPacked kernel ≡ HOF") {
    val words = (1 to 30).map { _ =>
      (Array.fill(4)(rnd.nextLong()), Array.fill(4)(rnd.nextLong()))
    }
    val wdf = words.toDF("a", "b")
    val rows = wdf.select(Distances.hammingPacked(col("a"), col("b")).as("k"),
      Distances.Hof.hammingPacked(col("a"), col("b")).as("h")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("kernels run in interpreted (non-codegen) mode too") {
    // eval path: use the expressions on a literal, forcing constant folding
    val r = df.limit(1).select(
      Distances.euclidean(typedLit(Array(1f, 2f, 3f)), typedLit(Array(4f, 5f, 6f))).as("d")).head()
    assert(math.abs(r.getDouble(0) - math.sqrt(27.0)) < 1e-12)
  }
}
