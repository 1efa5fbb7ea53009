package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import sqlImplicits._

  test("each left row matches the greatest right time <= its time, per key") {
    val left = Seq((1, 10, "l10"), (1, 25, "l25"), (1, 5, "l5"), (2, 8, "l8")).toDF("k", "t", "name")
    val right = Seq((1, 10, "r10"), (1, 20, "r20"), (2, 9, "r9")).toDF("k", "t", "tag")
      .withColumnRenamed("t", "rt")
    val out = AsOfJoin.asof(left, right, "k", "t", "rt", Seq("tag"))
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("tag"))).toMap
    assert(out === Map("l10" -> "r10", "l25" -> "r20")) // inclusive at equality
    // l5 (before any right) and l8 (right is at 9 > 8) drop out — inner join
  }

  test("plan shape: one hash partitioning by key, no inequality join") {
    val left = Seq((1, 10, "a")).toDF("k", "t", "name")
    val right = Seq((1, 9, "x")).toDF("k", "rt2", "tag")
    val plan = AsOfJoin.asof(left, right, "k", "t", "rt2", Seq("tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan.take(500))
  }
}
