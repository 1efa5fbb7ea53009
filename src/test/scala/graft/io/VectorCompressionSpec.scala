package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorCompressionSpec extends SparkSpec {
  import sqlImplicits._

  test("round-trip is bit-exact, including NaN payloads, infinities and -0.0") {
    val v = Array(1.5f, -0.0f, 0.0f, Float.NaN,
      java.lang.Float.intBitsToFloat(0x7fc00123), // non-canonical NaN payload
      Float.PositiveInfinity, Float.NegativeInfinity,
      Float.MinPositiveValue, Float.MaxValue, -123.456f)
    val back = VectorCompression.decompress(VectorCompression.compress(v))
    assert(back.length === v.length)
    v.indices.foreach { i =>
      assert(java.lang.Float.floatToRawIntBits(back(i)) ===
        java.lang.Float.floatToRawIntBits(v(i)), s"bit mismatch at $i")
    }
  }

  test("empty and single-element vectors round-trip") {
    assert(VectorCompression.decompress(VectorCompression.compress(Array.empty[Float])).isEmpty)
    val one = VectorCompression.decompress(VectorCompression.compress(Array(42.25f)))
    assert(one.toSeq === Seq(42.25f))
  }

  test("smooth data compresses below raw size (the fpzip use case)") {
    val smooth = Array.tabulate(1024)(i => (i / 1024.0f) + 1.0f)
    val c = VectorCompression.compress(smooth)
    assert(c.length < smooth.length * 4,
      s"compressed ${c.length} vs raw ${smooth.length * 4}")
  }

  test("column verbs round-trip through a DataFrame") {
    val df = Seq((1L, Seq(1.0f, 2.5f, -3.25f)), (2L, Seq(0.0f, -0.0f, Float.NaN)))
      .toDF("id", "vec")
    val round = df
      .withColumn("z", VectorCompression.compressCol(col("vec")))
      .withColumn("back", VectorCompression.decompressCol(col("z")))
      .select(col("id"), col("vec"), col("back"))
      .collect()
    round.foreach { r =>
      val a = r.getSeq[Float](1).map(java.lang.Float.floatToIntBits)
      val b = r.getSeq[Float](2).map(java.lang.Float.floatToIntBits)
      assert(a === b)
    }
  }
}
