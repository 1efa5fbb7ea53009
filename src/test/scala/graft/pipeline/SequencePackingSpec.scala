package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("packRows: boundary-crossing docs split into per-window sub-ranges") {
    val rows = SequencePacking.packRows(d, "shard", "doc_id", "n_tokens", seqLen = 64)
      .collect()
      .map(r => (r.getAs[String]("shard"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_off"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("doc_off"), r.getAs[Long]("span_len")))
      .toSet
    // A1 (100 toks at 0): window 0 gets toks 0-63, window 1 gets 64-99
    assert(rows.contains(("A", 0L, 0L, 1L, 0L, 64L)))
    assert(rows.contains(("A", 1L, 0L, 1L, 64L, 36L)))
    // A2 (50 toks at 100): finishes window 1 then opens window 2
    assert(rows.contains(("A", 1L, 36L, 2L, 0L, 28L)))
    assert(rows.contains(("A", 2L, 0L, 2L, 28L, 22L)))
    // A3 is empty: no rows anywhere
    assert(!rows.exists(r => r._1 == "A" && r._4 == 3L))
    // A4 (120 toks at 150): tail of window 2, all of 3, head of 4
    assert(rows.contains(("A", 2L, 22L, 4L, 0L, 42L)))
    assert(rows.contains(("A", 3L, 0L, 4L, 42L, 64L)))
    assert(rows.contains(("A", 4L, 0L, 4L, 106L, 14L)))
    // B1 fills window 0 exactly; B2's single token opens window 1
    assert(rows.contains(("B", 0L, 0L, 1L, 0L, 64L)))
    assert(rows.contains(("B", 1L, 0L, 2L, 0L, 1L)))
    assert(rows.size === 9)
  }

  test("packRows: spans reconstruct every document and every window exactly") {
    val rows = SequencePacking.packRows(d, "shard", "doc_id", "n_tokens", 64).collect()
    // per-document: spans ordered by seq_id partition [0, n_tokens)
    rows.groupBy(r => (r.getAs[String]("shard"), r.getAs[Long]("doc_id")))
      .foreach { case ((shard, doc), spans) =>
        val ordered = spans.sortBy(_.getAs[Long]("seq_id"))
        val offs = ordered.map(_.getAs[Long]("doc_off"))
        val lens = ordered.map(_.getAs[Long]("span_len"))
        assert(offs.head === 0L, s"($shard,$doc) first span must start the doc")
        assert(offs.zip(lens).zip(offs.tail).forall { case ((o, l), nxt) => o + l == nxt },
          s"($shard,$doc) spans must be contiguous in doc-token space")
        assert(lens.forall(_ > 0L))
      }
    // per-window: spans ordered by seq_off tile [0, 64) with no gaps
    // (every window except each shard's last is completely full)
    rows.groupBy(r => (r.getAs[String]("shard"), r.getAs[Long]("seq_id")))
      .foreach { case ((shard, seq), spans) =>
        val ordered = spans.sortBy(_.getAs[Long]("seq_off"))
        assert(ordered.head.getAs[Long]("seq_off") === 0L)
        val end = ordered.map(r => r.getAs[Long]("seq_off") + r.getAs[Long]("span_len"))
        assert(ordered.map(_.getAs[Long]("seq_off")).tail === end.init.toSeq,
          s"($shard,$seq) window spans must tile without gaps")
        assert(end.last <= 64L)
      }
  }

  test("BPE-token composition: spans partition the ENCODED token stream exactly") {
    // train a tiny BPE, count real subword tokens, pack on those counts —
    // the sequence_pack_bpe composition (spans in encoded-token space)
    val docs = Seq(
      (1L, "s", "aa aa bb"), (2L, "s", "aa bb bb aa"), (3L, "s", ""),
      (4L, "t", "bb aa")).toDF("doc_id", "shard", "text")
    val rules = Bpe.train(docs, "text", merges = 2)
    val enc = Bpe.encodeColumn(col("text"), rules)
    val counted = docs.select(col("doc_id"), col("shard"),
      Bpe.tokenCountColumn(enc).as("n_tokens"))
    val nTok = counted.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = SequencePacking.packRows(counted, "shard", "doc_id", "n_tokens", 4)
      .collect()
    // per doc, spans cover [0, n_bpe_tokens) exactly; empty doc emits none
    assert(!rows.exists(_.getAs[Long]("doc_id") == 3L))
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, spans) =>
      assert(spans.map(_.getAs[Long]("span_len")).sum === nTok(doc),
        s"doc $doc spans must sum to its ENCODED token count")
    }
    // and per shard, total packed tokens equal total encoded tokens
    val byShard = rows.groupBy(_.getAs[String]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("span_len")).sum).toMap
    val wantShard = counted.collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byShard === wantShard.filter(_._2 > 0))
  }
}
