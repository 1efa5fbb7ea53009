package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistancesSpec extends SparkSpec {
  import sqlImplicits._

  private def one(a: Array[Float], b: Array[Float], m: String): Double = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(Distances.metric(m)(col("a"), col("b")).as("d")).head().getDouble(0)
  }

  val a = Array(1f, 2f, 3f)
  val b = Array(4f, 5f, 6f)

  test("euclidean: sqrt(27) on the reference's canonical pair") {
    assert(math.abs(one(a, b, "euclidean") - math.sqrt(27.0)) < 1e-12)
  }

  test("manhattan: 9") { assert(one(a, b, "manhattan") === 9.0) }

  test("chebyshev: 3") { assert(one(a, b, "chebyshev") === 3.0) }

  test("minkowski p=3: (81)^(1/3)") {
    assert(math.abs(one(a, b, "minkowski") - math.pow(81.0, 1.0 / 3.0)) < 1e-12)
  }

  test("cosine returns SIMILARITY (bug-compatible), not distance") {
    // identical vectors → similarity 1.0 (a true distance would be 0)
    assert(math.abs(one(a, a, "cosine") - 1.0) < 1e-12)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(one(a, b, "cosine") - expected) < 1e-12)
  }

  test("cosine_distance is the corrected metric: 0 for identical vectors") {
    assert(math.abs(one(a, a, "cosine_distance")) < 1e-12)
  }

  test("magnitude: sqrt(14)") {
    val df = Seq(Tuple1(a)).toDF("a")
    val m = df.select(Distances.magnitude(col("a")).as("m")).head().getDouble(0)
    assert(math.abs(m - math.sqrt(14.0)) < 1e-12)
  }

  test("hammingPacked: xor+popcount over packed words") {
    val df = Seq((Array(0xFFL, 0x0L), Array(0x0FL, 0x3L))).toDF("a", "b")
    val h = df.select(Distances.hammingPacked(col("a"), col("b")).as("h")).head().getLong(0)
    assert(h === 4 + 2)
  }

  test("identity and symmetry hold for the true metrics") {
    for (m <- Seq("euclidean", "manhattan", "chebyshev", "minkowski")) {
      assert(one(a, a, m) === 0.0, s"$m identity")
      assert(one(a, b, m) === one(b, a, m), s"$m symmetry")
    }
  }

  test("unknown metric name raises") {
    intercept[IllegalArgumentException](Distances.metric("nope"))
  }
}
