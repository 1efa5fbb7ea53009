package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Proves the q_events_window plan shape (event-time tumbling aggregation)
  * runs unchanged under readStream + watermark — the streaming-compatible
  * claim in RelationalQueries. */
class StreamingWindowSpec extends SparkSpec {

  case class Event(ts: java.sql.Timestamp, event_type: String, value: Double)

  private def t(minute: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("event-time tumbling window with watermark aggregates like the batch plan") {
    implicit val sql = spark.sqlContext
    import sqlImplicits._
    val source = MemoryStream[Event]
    val agg = source.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    val q = agg.writeStream.format("memory").queryName("evw")
      .outputMode("complete").start()
    source.addData(Event(t(5), "click", 1.5), Event(t(10), "click", 2.5),
      Event(t(15), "view", 4.0))
    q.processAllAvailable()
    val rows = spark.table("evw").collect()
      .map(r => r.getAs[String]("event_type") -> (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    q.stop()
    assert(rows === Map("click" -> (2L, 4.0), "view" -> (1L, 4.0)))
  }
}
