package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-search similarity-threshold semantics, reproduced exactly from
  * SearchService.cs:171-189 including the high-dimension bypass quirk:
  * the `dist <= threshold` filter is SKIPPED when
  * `dim > 50 && max(result dist) > 5.0 && threshold > 1.5`.
  *
  * The bypass condition's `max(dist)` is a scalar aggregate broadcast back
  * onto the rows — a partial-aggregable plan that stays safe at any input
  * cardinality (an unpartitioned window here would collapse to one
  * partition if ever applied beyond a k-row result set).
  */
object ThresholdFilter {

  def apply(results: DataFrame, distCol: String, threshold: Double, dim: Int): DataFrame =
    if (dim > 50 && threshold > 1.5) {
      val maxDist = results.agg(max(col(distCol)).as("_max_dist"))
      results.crossJoin(broadcast(maxDist))
        .filter(col("_max_dist") > 5.0 || col(distCol) <= threshold)
        .drop("_max_dist")
    } else {
      results.filter(col(distCol) <= threshold)
    }

  /** The same semantics over an already-collected k-row result (the warm
    * serve path holds its hits driver-side; re-entering Catalyst just to
    * filter k rows would cost a full SQL action). One source of truth
    * for the quirk: same bypass condition, same comparisons. */
  def applyLocal[T](results: Seq[(T, Double)], threshold: Double, dim: Int): Seq[(T, Double)] =
    if (dim > 50 && threshold > 1.5) {
      // Spark SQL orders NaN GREATEST, so `max(dist) > 5.0` fires when
      // any distance is NaN — mirror that (Scala's own NaN comparisons
      // would silently drop such rows only on this driver-side path)
      val bypass = results.exists { case (_, d) => d.isNaN || d > 5.0 }
      if (bypass) results else results.filter(_._2 <= threshold)
    } else results.filter(_._2 <= threshold)

  /** Default threshold by query-text length (SearchService.cs:82-102):
    * <5 chars → 0.9, <20 → 0.8, else 0.5. */
  def defaultThreshold(queryText: String): Double =
    if (queryText.length < 5) 0.9
    else if (queryText.length < 20) 0.8
    else 0.5
}
