package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucketing (build brief: a range join
  * expressed scale-safely). A naive `s <= p AND p < e` predicate plans as
  * a nested-loop join — quadratic at scale. Bucketing makes it an
  * equi-join: every point lands in one `floor(p/width)` bucket, every
  * interval explodes to the buckets it covers, the join runs on the bucket
  * id and the exact predicate filters the boundary cases. Each matching
  * (point, interval) pair meets in exactly one bucket (the point's), so no
  * dedup is needed. `width` should be on the order of the typical interval
  * length: wider means fewer replicas, narrower means tighter buckets.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      width: Double): DataFrame = {
    val p = points.withColumn("_bucket", floor(col(pointCol) / width))
    val i = intervals.withColumn("_bucket",
      explode(sequence(floor(col(startCol) / width), floor(col(endCol) / width))))
    p.join(i, "_bucket")
      .filter(col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
