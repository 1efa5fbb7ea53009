package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Record-level verbs (Vector.cs:185-325) — pure JVM, no session. */
class VectorRecordSpec extends AnyFunSuite {

  private val a = VectorRecord("a", Array(3f, 4f))
  private val b = VectorRecord("b", Array(1f, 2f))

  test("magnitude, dimension, indexer") {
    assert(a.magnitude === 5.0)
    assert(a.dimension === 2)
    assert(a(1) === 4f)
  }

  test("distance is euclidean with double accumulation (matches column kernel numerics)") {
    assert(a.distance(b) === math.sqrt(4.0 + 4.0))
    assert(a.distance(a) === 0.0)
    // pairwise-min length, like the reference's pairwise handling
    assert(VectorRecord("c", Array(3f)).distance(b) === 2.0)
  }

  test("arithmetic returns fresh records; dimension mismatch throws; /0 throws") {
    assert((a + b).values.toSeq === Seq(4f, 6f))
    assert((a - b).values.toSeq === Seq(2f, 2f))
    assert((a / 2).values.toSeq === Seq(1.5f, 2f))
    assert((a + b).id === "")
    intercept[IllegalArgumentException](a + VectorRecord("x", Array(1f)))
    intercept[IllegalArgumentException](a / 0)
  }

  test("compressed binary round-trips through the record verbs") {
    val back = VectorRecord.fromCompressedBinary(a.toCompressedBinary)
    assert(back.values.toSeq === a.values.toSeq)
  }
}
