package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import sqlImplicits._

  test("salted join returns exactly the plain join's rows on a skewed key") {
    // 90% of big rows share one key — the pathological case
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 1, i.toLong)).toDF("k", "row_id")
    val small = Seq((1, "hot"), (2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "f"), (0, "z")).toDF("k", "v")
    val plain = big.join(small, "k").groupBy($"k", $"v").count()
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "k", salts = 8, saltSrc = $"row_id")
      .groupBy($"k", $"v").count()
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(salted === plain)
  }

  test("HLL approx distinct stays within 5% of exact on the events table") {
    val e = graft.queries.eventsTable(spark, "/root/testdata/sf0.01")
    val rows = e.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"), approx_count_distinct($"user_id").as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx quantile sketch stays within 2% of exact percentiles per group") {
    val e = graft.queries.eventsTable(spark, "/root/testdata/sf0.01")
    val rows = e.groupBy($"event_type")
      .agg(
        percentile($"value", lit(0.5)).as("exact50"),
        percentile_approx($"value", lit(0.5), lit(10000)).as("approx50"),
        percentile($"value", lit(0.95)).as("exact95"),
        percentile_approx($"value", lit(0.95), lit(10000)).as("approx95"))
      .collect()
    rows.foreach { r =>
      Seq(("p50", r.getDouble(1), r.getDouble(2)), ("p95", r.getDouble(3), r.getDouble(4)))
        .foreach { case (name, exact, approx) =>
          assert(math.abs(approx - exact) <= math.max(0.02 * math.abs(exact), 1e-9),
            s"${r.getString(0)} $name: approx $approx vs exact $exact")
        }
    }
  }
}
