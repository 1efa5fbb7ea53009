package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import sqlImplicits._

  test("sourceStats counts docs, tokens, distinct contents and dup rate per source") {
    val d = Seq(
      (1L, "a", "one two three"),
      (2L, "a", "one two three"), // exact dup within source a
      (3L, "a", "four five"),
      (4L, "b", "solo doc here")).toDF("doc_id", "source", "text")
    val out = CorpusStats.sourceStats(d, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("a") === ((3L, 8L, 2L, 0.333333)))
    assert(out("b") === ((1L, 3L, 1L, 0.0)))
  }

  test("sourceStats is one aggregate (single exchange pair, no join)") {
    val d = Seq((1L, "a", "x y")).toDF("doc_id", "source", "text")
    val plan = CorpusStats.sourceStats(d, "source", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("langLengthFilter keeps rows inside their own language's percentile band") {
    // lang 'x': lengths 1..20 -> p05 = 1.95, p95 = 19.05 (interpolated):
    // keeps 2..19. lang 'y': constant length -> band degenerates to it.
    val d = ((1 to 20).map(i => (i.toLong, "x", i.toLong)) ++
      Seq((100L, "y", 7L), (101L, "y", 7L))).toDF("doc_id", "lang", "n_chars")
    val out = CorpusStats.langLengthFilter(d, "lang", "n_chars")
    val xs = out.filter($"lang" === "x").select($"n_chars")
      .collect().map(_.getLong(0)).sorted
    assert(xs.toSeq === (2L to 19L))
    val x = out.filter($"lang" === "x").select($"lo", $"hi").head()
    assert(x.getDouble(0) === 1.95 && x.getDouble(1) === 19.05)
    assert(out.filter($"lang" === "y").count() === 2)
  }

  test("langLengthFilter broadcasts the bounds (no shuffle join back)") {
    val d = Seq((1L, "x", 5L), (2L, "x", 6L)).toDF("doc_id", "lang", "n_chars")
    val plan = CorpusStats.langLengthFilter(d, "lang", "n_chars")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
