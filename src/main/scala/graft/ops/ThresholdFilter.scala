package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-search similarity-threshold semantics, reproduced exactly from
  * SearchService.cs:171-189 including the high-dimension bypass quirk:
  * the `dist <= threshold` filter is SKIPPED when
  * `dim > 50 && max(result dist) > 5.0 && threshold > 1.5`.
  *
  * Result sets are k rows (tiny), so the single-partition window computing
  * the max is O(k) — not a scale concern.
  */
object ThresholdFilter {

  def apply(results: DataFrame, distCol: String, threshold: Double, dim: Int): DataFrame =
    if (dim > 50 && threshold > 1.5) {
      val w = Window.partitionBy() // global max over the (k-row) result set
      results
        .withColumn("_max_dist", max(col(distCol)).over(w))
        .filter(col("_max_dist") > 5.0 || col(distCol) <= threshold)
        .drop("_max_dist")
    } else {
      results.filter(col(distCol) <= threshold)
    }

  /** Default threshold by query-text length (SearchService.cs:82-102):
    * <5 chars → 0.9, <20 → 0.8, else 0.5. */
  def defaultThreshold(queryText: String): Double =
    if (queryText.length < 5) 0.9
    else if (queryText.length < 20) 0.8
    else 0.5
}
