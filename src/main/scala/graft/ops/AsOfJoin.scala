package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — an operator Spark lacks natively
  * (build brief: compose it from existing ops rather than a custom
  * physical operator, since the semantics allow it).
  *
  * For every left row, attach the payload of the right row with the same
  * key and the greatest `rightTime <= leftTime` (inclusive). Composed
  * scale-safely: both sides union into one frame, one hash partition by
  * key, and a running `last(payload, ignoreNulls)` over the time order
  * carries each right payload forward to the left rows it matches. No
  * inequality join, no per-row range scan — the shuffle is exactly one
  * `HashPartitioning(key)` and the window is a single ordered pass.
  *
  * Right rows must be unique per (key, time) — the same requirement
  * DuckDB's ASOF JOIN has for a deterministic result; ties at equal time
  * match inclusively (right sorts before left).
  */
object AsOfJoin {

  /** Inner as-of join. `payload` = right columns to attach (names must not
    * clash with left columns). Left columns pass through unchanged. */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftOther = left.columns.toSeq.filterNot(_ == key)
    val r = right.select(col(key), col(rightTime).as("_t"),
      lit(0).as("_src"), struct(payload.map(col): _*).as("_payload"))
    val payloadType = r.schema("_payload").dataType

    val lTagged = left.select(
      Seq(col(key), col(leftTime).as("_t"), lit(1).as("_src"),
        lit(null).cast(payloadType).as("_payload")) ++ leftOther.map(col): _*)
    val rTagged = r.select(
      Seq(col(key), col("_t"), col("_src"), col("_payload")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_src") === 1 && col("_match").isNotNull)
      .select((col(key) +: leftOther.map(col)) ++
        payload.map(p => col("_match").getField(p).as(p)): _*)
  }
}
