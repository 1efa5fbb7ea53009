package graft.queries

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}

/** Hand-computed cases for the behavioural-analytics keys (the DuckDB
  * gate is their cross-engine referee; this pins the SEMANTICS —
  * strict-after ordering in the funnel, ISO-week cohort arithmetic —
  * on inputs small enough to verify by eye). */
class EventAnalyticsSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_spec").toString
    Seq(
      // u1: full ordered funnel
      (1L, ts("2026-01-05 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2026-01-05 10:01:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2026-01-05 10:02:00"), 1L, "purchase", 1.0, "{}"),
      // u2: click ties the view timestamp -> strict 'after' excludes it;
      // the later purchase cannot count without a qualifying click
      (4L, ts("2026-01-05 11:00:00"), 2L, "view", 1.0, "{}"),
      (5L, ts("2026-01-05 11:00:00"), 2L, "click", 1.0, "{}"),
      (6L, ts("2026-01-05 12:00:00"), 2L, "purchase", 1.0, "{}"),
      // u3: purchase only -> stage 0
      (7L, ts("2026-01-05 13:00:00"), 3L, "purchase", 1.0, "{}"),
      // u4: view then click, no purchase -> stage 2; also active 2 weeks on
      (8L, ts("2026-01-06 09:00:00"), 4L, "view", 1.0, "{}"),
      (9L, ts("2026-01-19 09:00:00"), 4L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("funnel stages: strictly-later chaining, stage 0 for never-viewed") {
    val out = SparkEntry.queries("funnel_stages")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 2))
  }

  test("retention cohorts: ISO-week buckets, distinct users per offset") {
    val out = SparkEntry.queries("retention_cohorts")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // all four users' first events fall in the week of Mon 2026-01-05;
    // u4 is also active in the week of Mon 2026-01-19 (= week 2)
    assert(out === Map(("2026-01-05", 0L) -> 4L, ("2026-01-05", 2L) -> 1L))
  }
}
