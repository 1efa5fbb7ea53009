package graft.queries

import org.apache.spark.sql.functions._

/** Relational surface: scans, filters, joins, aggregations, top-k —
  * the Spark-built-in layer every other operator composes with
  * (SURVEY §2.2-§2.6). Doubles that pass through an aggregate are rounded
  * on BOTH sides (here and in the oracle) because partial-aggregation sum
  * order differs between engines in the last bits.
  */
object RelationalQueries {

  val defs: Map[String, Q] = Map(
    // TPC-H Q1-shaped scan+aggregate: predicate pushdown + partial aggs.
    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 4) AS sum_qty,
        | round(sum(l_extendedprice), 4) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
}
