package graft.api

import graft.SparkSpec
import graft.core.VectorRecord

/** The observable concurrency contract, scripted-schedule style (the
  * analog of Tests/ConcurrencyTestFramework.cs:10-50 /
  * DeterministicConcurrencyTests.cs:30-226, re-expressed for the
  * single-writer facade): reads are immutable snapshots, every mutation
  * is atomic from a reader's perspective, and interleaved verb sequences
  * are equivalent to their serial order. */
class ConcurrencySemanticsSpec extends SparkSpec {

  private def db(): NeighborlySpark = {
    val d = new NeighborlySpark(spark, 2)
    d.addVector(VectorRecord("a", Array(0f, 0f), original_text = "a"))
    d.addVector(VectorRecord("b", Array(1f, 0f), original_text = "b"))
    d
  }

  test("readers hold consistent snapshots across later mutations (no torn reads)") {
    val d = db()
    val snapshot = d.vectors // a reader's view, taken "before" the writer acts
    d.updateVector("a", Array(9f, 9f), "rewritten")
    d.removeVector("b")
    d.addVector(VectorRecord("c", Array(2f, 2f), original_text = "c"))
    // the old snapshot still reads the exact pre-mutation table — the
    // lock-free equivalent of the reference's reader/writer lock guarantee
    val seen = snapshot.collect().map(r =>
      r.getAs[String]("id") -> r.getAs[String]("original_text")).toMap
    assert(seen === Map("a" -> "a", "b" -> "b"))
    // and the live table sees all mutations, fully applied
    val live = d.vectors.collect().map(_.getAs[String]("id")).sorted
    assert(live.toSeq === Seq("a", "c"))
  }

  test("a scripted interleaving of two verb streams equals its serial order") {
    // schedule: W1.add(x) ; W2.update(a) ; W1.remove(b) ; W2.add(y)
    // (single-writer: the facade serializes; the assertion is that the
    // scripted order IS the observable history)
    val d = db()
    d.addVector(VectorRecord("x", Array(3f, 0f), original_text = "x"))
    assert(d.updateVector("a", Array(5f, 5f), "a2"))
    assert(d.removeVector("b"))
    d.addVector(VectorRecord("y", Array(0f, 3f), original_text = "y"))
    val state = d.vectors.collect().map(r =>
      r.getAs[String]("id") -> r.getAs[String]("original_text")).toMap
    assert(state === Map("a" -> "a2", "x" -> "x", "y" -> "y"))
  }

  test("mutations during an open search plan do not corrupt its result") {
    val d = db()
    val plan = d.search(Array(0f, 0f), 2, SearchAlgorithm.Linear, 10.0) // lazy plan over the snapshot
    d.removeVector("a") // writer proceeds before the reader executes
    val got = plan.collect().map(_.getAs[String]("id")).toSeq
    assert(got === Seq("a", "b")) // the plan's snapshot still includes "a"
  }
}
