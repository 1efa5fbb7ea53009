package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val points = Seq(0.5, 1.0, 3.99, 4.0, 7.5, 100.0).map(Tuple1(_)).toDF("p")
  private lazy val intervals = Seq((1, 1.0, 4.0), (2, 3.0, 8.0), (3, 50.0, 60.0))
    .toDF("iid", "lo", "hi")

  test("bucketed result equals the naive inequality join (boundaries inclusive-exclusive)") {
    val bucketed = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width = 2.0)
      .select($"p", $"iid").collect().map(r => (r.getDouble(0), r.getInt(1))).sorted.toSeq
    val naive = points.join(intervals, $"lo" <= $"p" && $"p" < $"hi")
      .select($"p", $"iid").collect().map(r => (r.getDouble(0), r.getInt(1))).sorted.toSeq
    assert(bucketed === naive)
    assert(bucketed.contains((1.0, 1)))   // inclusive lower bound
    assert(!bucketed.contains((4.0, 1)))  // exclusive upper bound
    assert(bucketed.contains((4.0, 2)))
  }

  test("each matching pair appears exactly once (no per-bucket duplicates)") {
    // interval 2 spans buckets 1..4 at width 2; point 7.5 is in exactly one
    val out = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width = 2.0)
      .groupBy($"p", $"iid").count().filter($"count" > 1).count()
    assert(out === 0)
  }

  test("plan is an equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width = 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan.take(400))
  }
}
