package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A driver-runnable query: (session, sf-dir) → result. */
  type Q = (SparkSession, String) => DataFrame

  /** Load one of the driver-provided parquet tables. */
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Cache key for memoized Spark-resident artifacts (checkpointed
    * frames, persisted index RDDs): scoped to the owning SparkContext so
    * a restarted session in the same JVM never receives frames whose
    * blocks belong to a stopped context. Pure values (fitted model
    * parameters, corpus stats) may key by dir alone. */
  def sessionKey(s: SparkSession, dir: String): String =
    s"${s.sparkContext.applicationId}:${s.sparkContext.startTime}|$dir"

  /** events.parquet carries TIMESTAMP(NANOS), which Spark reads as a
    * nanos-since-epoch BIGINT under spark.sql.legacy.parquet.nanosAsLong
    * (set in every session builder here). Normalize to a micros timestamp;
    * integer `div` avoids double-precision loss at 1e18 magnitudes. */
  def eventsTable(s: SparkSession, dir: String): DataFrame = {
    val raw = table(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }

  /** DuckDB SQL fragment: euclidean distance between two FLOAT[] columns,
    * computed in double with a sequential left-to-right fold — matches
    * graft.functions.Distances numerics exactly — rounded to 6 decimals. */
  def sqlEuclid(a: String, b: String): String =
    s"round(sqrt(list_reduce(list_transform(list_zip($a, $b), " +
      "p -> (CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))*(CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))), " +
      "(x,y) -> x+y)), 6)"

  /** Raw (unrounded, un-sqrt'd) squared euclidean — for argmin / probe
    * ORDER BY comparisons where only the ordering is consumed (sqrt is
    * strictly monotone, so squared ordering == distance ordering). */
  def sqlEuclidSq(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"p -> ($dElem1 - $dElem2)*($dElem1 - $dElem2)), (x,y) -> x+y)"

  /** DuckDB fragment: sequential-fold sum of an expression over zipped lists. */
  def sqlZipSum(a: String, b: String, elemExpr: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> $elemExpr), (x,y) -> x+y)"

  val dElem1 = "CAST(p[1] AS DOUBLE)"
  val dElem2 = "CAST(p[2] AS DOUBLE)"

  def sqlManhattan(a: String, b: String): String =
    s"round(${sqlZipSum(a, b, s"abs($dElem1 - $dElem2)")}, 6)"

  def sqlChebyshev(a: String, b: String): String =
    s"round(list_reduce(list_transform(list_zip($a, $b), p -> abs($dElem1 - $dElem2)), (x,y) -> greatest(x,y)), 6)"

  def sqlMinkowski3(a: String, b: String): String =
    s"round(pow(${sqlZipSum(a, b, s"abs($dElem1 - $dElem2) * abs($dElem1 - $dElem2) * abs($dElem1 - $dElem2)")}, 1.0/3.0), 6)"

  def sqlMagnitude(a: String): String =
    s"sqrt(list_reduce(list_transform($a, q -> CAST(q AS DOUBLE) * CAST(q AS DOUBLE)), (x,y) -> x+y))"

  def sqlCosineSim(a: String, b: String): String =
    s"round(${sqlCosineSimRaw(a, b)}, 6)"

  def sqlCosineSimRaw(a: String, b: String): String =
    s"(${sqlZipSum(a, b, s"$dElem1 * $dElem2")} / (${sqlMagnitude(a)} * ${sqlMagnitude(b)}))"
}
