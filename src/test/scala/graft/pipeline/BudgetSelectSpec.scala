package graft.pipeline

import graft.SparkSpec

class BudgetSelectSpec extends SparkSpec {
  import sqlImplicits._

  private def naive(rows: Seq[(Long, Double, Long)], budget: Long): Set[Long] = {
    var cum = 0L
    rows.sortBy { case (id, s, _) => (-s, id) }
      .takeWhile { case (_, _, t) => { cum += t; cum <= budget } }
      .map(_._1).toSet
  }

  private def run(rows: Seq[(Long, Double, Long)], budget: Long): Set[Long] =
    BudgetSelect.budgetSelect(rows.toDF("doc_id", "score", "n_tokens"),
        "doc_id", "score", "n_tokens", budget)
      .collect().map(_.getLong(0)).toSet

  test("boundary bucket is cut per-doc in id order") {
    val rows = Seq(
      (1L, 0.9, 10L), (2L, 0.9, 10L),            // full bucket: 20
      (3L, 0.5, 10L), (4L, 0.5, 10L), (5L, 0.5, 10L), // boundary at 35
      (6L, 0.1, 1L))
    // budget 35: bucket .9 fully (20), then ids 3 (30) — id 4 would hit 40
    assert(run(rows, 35) == Set(1L, 2L, 3L))
    assert(run(rows, 35) == naive(rows, 35))
  }

  test("zero-token docs ride along even at an exactly exhausted budget") {
    val rows = Seq(
      (1L, 0.9, 10L),
      (2L, 0.5, 0L), (3L, 0.5, 4L), (4L, 0.5, 0L))
    // budget 10: bucket .9 exhausts it; in bucket .5 the id-order prefix
    // admits doc 2 (cum stays 10) and stops at doc 3 (would be 14) —
    // doc 4 sits behind doc 3 in the prefix, so it is NOT selected
    assert(run(rows, 10) == Set(1L, 2L))
    assert(run(rows, 10) == naive(rows, 10))
  }

  test("matches the naive global prefix on random corpora") {
    val rnd = new scala.util.Random(5)
    for (trial <- 0 until 30) {
      val rows = (1L to (1 + rnd.nextInt(60)).toLong).map { id =>
        (id, rnd.nextInt(8) / 100.0 + 0.9, rnd.nextInt(15).toLong) }
      val budget = rnd.nextInt(300).toLong
      assert(run(rows, budget) == naive(rows, budget), s"trial $trial budget=$budget")
    }
  }

  test("sub-micro score ties collapse into one bucket and cut in id order (the si contract)") {
    // 0.5 and 0.5 + 4e-7 freeze to the SAME micro-unit (500000): the
    // contract says they tie, so the cut inside the merged bucket runs
    // in id order — doc 3 (the higher raw score!) is cut because doc 2
    // precedes it by id. A raw-double ordering would keep doc 3 instead.
    val rows = Seq(
      (1L, 0.9, 10L),
      (2L, 0.5, 10L),
      (3L, 0.5 + 4e-7, 10L),
      (4L, 0.1, 1L))
    assert(run(rows, 20) == Set(1L, 2L))
    // and a full-micro-unit gap does NOT tie: 0.5 + 2e-6 outranks 0.5
    val apart = Seq(
      (1L, 0.9, 10L),
      (2L, 0.5, 10L),
      (3L, 0.5 + 2e-6, 10L))
    assert(run(apart, 20) == Set(1L, 3L))
  }

  test("budget 0 and budget >= total") {
    val rows = Seq((1L, 0.9, 5L), (2L, 0.8, 0L), (3L, 0.7, 5L))
    assert(run(rows, 0) == naive(rows, 0))
    assert(run(rows, 100) == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException](run(rows, -1))
  }

  test("no global corpus sort: the only global window is the bounded bucket frame") {
    val rows = (1L to 200L).map(id => (id, (id % 7) / 10.0, 3L))
    val plan = BudgetSelect.budgetSelect(rows.toDF("doc_id", "score", "n_tokens"),
        "doc_id", "score", "n_tokens", 100)
      .queryExecution.executedPlan.toString
    // a global ORDER BY prefix would show a range-partitioned exchange
    // over the corpus; the histogram plan must not have one
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(plan.contains("BroadcastExchange"), plan) // bucket marks broadcast
  }
}
