package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Proves the q_events_window plan shape (event-time tumbling aggregation)
  * runs unchanged under readStream + watermark — the streaming-compatible
  * claim in RelationalQueries. */
case class WindowSpecEvent(ts: java.sql.Timestamp, event_type: String, value: Double)
case class WindowSpecUserEvent(ts: java.sql.Timestamp, user_id: Long, value: Double)

class StreamingWindowSpec extends SparkSpec {

  private type Event = WindowSpecEvent
  private val Event = WindowSpecEvent
  private type UserEvent = WindowSpecUserEvent
  private val UserEvent = WindowSpecUserEvent

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

  test("gap-based session_window with watermark matches the batch q_session_window plan") {
    implicit val sql = spark.sqlContext
    import sqlImplicits._
    // user 1: two events 10 min apart (one session) then one 40 min
    // later (second session); user 2: a single event
    val events = Seq(
      UserEvent(t(0), 1L, 1.0), UserEvent(t(10), 1L, 2.0),
      UserEvent(t(50), 1L, 4.0), UserEvent(t(5), 2L, 8.0))
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n"), col("sum_value"))

    val source = MemoryStream[UserEvent]
    val q = sessions(source.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("sessw")
      .outputMode("complete").start()
    source.addData(events: _*)
    q.processAllAvailable()
    val streamed = spark.table("sessw").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3))).toSet
    q.stop()

    val batch = sessions(events.toDF()).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch)
    assert(streamed === Set(
      (1L, t(0).toString, 2L, 3.0),   // merged 0+10 session
      (1L, t(50).toString, 1L, 4.0),  // gap > 30 min -> new session
      (2L, t(5).toString, 1L, 8.0)))
  }
}
