package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join strategy the engine prescribes for
  * repeated large joins at 100 TB (build brief: "co-locate joins via
  * bucketing or pre-partitioning"): both sides bucketed on the join key
  * → the sort-merge join reads buckets pairwise with NO shuffle
  * exchange. This spec pins that plan shape and result equality on the
  * real testdata tables.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero shuffle exchanges, same results") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    spark.sql("DROP TABLE IF EXISTS g_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS g_ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("g_li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("g_ord_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion is about bucket
      // co-location, not about AQE electing a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("g_li_bucketed")
        .join(spark.table("g_ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("q"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, plan:\n${plan.take(2000)}")
      // same answer as the unbucketed join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("q"))
        .collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq ===
        expected.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS g_ord_bucketed")
    }
  }
}
