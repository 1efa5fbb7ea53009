package graft.pipeline

import graft.SparkSpec

class SequencePackingSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val d = Seq(
    // shard A: 100 + 50 + 0 + 120 tokens against L=64
    ("A", 1L, 100L), ("A", 2L, 50L), ("A", 3L, 0L), ("A", 4L, 120L),
    // shard B restarts its own concatenation
    ("B", 1L, 64L), ("B", 2L, 1L)
  ).toDF("shard", "doc_id", "n_tokens")

  test("offsets, window spans, empty docs, and shard isolation") {
    val out = SequencePacking.packAssignments(d, "shard", "doc_id", "n_tokens", seqLen = 64)
      .collect().map(r => (r.getAs[String]("shard"), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Long]("start_tok"), r.getAs[Long]("first_seq"), r.getAs[Long]("n_seqs"))))
      .toMap
    assert(out(("A", 1L)) === ((0L, 0L, 2L)))     // tokens 0-99 → windows 0,1
    assert(out(("A", 2L)) === ((100L, 1L, 2L)))   // 100-149 → windows 1,2
    assert(out(("A", 3L)) === ((150L, 2L, 0L)))   // empty doc touches nothing
    assert(out(("A", 4L)) === ((150L, 2L, 3L)))   // 150-269 → windows 2,3,4
    // shard B's concatenation is independent of A's
    assert(out(("B", 1L)) === ((0L, 0L, 1L)))     // 0-63: exactly window 0
    assert(out(("B", 2L)) === ((64L, 1L, 1L)))    // the boundary token opens window 1
  }

  test("assignment is invariant under repartitioning") {
    val a = SequencePacking.packAssignments(d, "shard", "doc_id", "n_tokens", 64)
      .collect().toSet
    val b = SequencePacking.packAssignments(d.repartition(5), "shard", "doc_id", "n_tokens", 64)
      .collect().toSet
    assert(a === b)
  }

  test("the window is shard-partitioned, never a global single partition") {
    val plan = SequencePacking.packAssignments(d, "shard", "doc_id", "n_tokens", 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"),
      s"packing must shuffle on the shard key, got:\n${plan.take(600)}")
    assert(!plan.contains("SinglePartition"),
      "a global running sum would serialize the corpus onto one partition")
  }

  test("seqLen is validated") {
    intercept[IllegalArgumentException] {
      SequencePacking.packAssignments(d, "shard", "doc_id", "n_tokens", 0)
    }
  }
}
