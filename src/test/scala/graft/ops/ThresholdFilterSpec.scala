package graft.ops

import graft.SparkSpec

class ThresholdFilterSpec extends SparkSpec {
  import sqlImplicits._

  private val results = Seq((1L, 0.5), (2L, 1.0), (3L, 6.0), (4L, 2.0))

  test("plain filter applies when dim <= 50") {
    val df = results.toDF("id", "dist")
    val got = ThresholdFilter(df, "dist", threshold = 1.6, dim = 50)
    assert(got.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("plain filter applies when threshold <= 1.5 even at high dim") {
    val df = results.toDF("id", "dist")
    val got = ThresholdFilter(df, "dist", threshold = 1.0, dim = 64)
    assert(got.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("bypass: dim > 50, max dist > 5, threshold > 1.5 → nothing filtered") {
    val df = results.toDF("id", "dist")
    val got = ThresholdFilter(df, "dist", threshold = 1.6, dim = 64)
    assert(got.count() === 4)
  }

  test("no bypass when all dists <= 5 even with dim > 50 and threshold > 1.5") {
    val df = Seq((1L, 0.5), (2L, 4.9), (3L, 2.0)).toDF("id", "dist")
    val got = ThresholdFilter(df, "dist", threshold = 1.6, dim = 64)
    assert(got.collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("default threshold heuristic by text length (SearchService.cs:82-102)") {
    assert(ThresholdFilter.defaultThreshold("abc") === 0.9)
    assert(ThresholdFilter.defaultThreshold("medium length q") === 0.8)
    assert(ThresholdFilter.defaultThreshold("a quite long query text here") === 0.5)
  }
}
