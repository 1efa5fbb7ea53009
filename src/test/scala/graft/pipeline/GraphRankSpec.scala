package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {
  import sqlImplicits._

  // path graph 1-2-3 plus isolated node 4; N = 4, r0 = 250000000,
  // base = 150000000/4 = 37500000
  private lazy val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
  private lazy val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")

  test("two iterations match the hand-computed integer fixed point") {
    val r = GraphRank.pageRank(nodes, edges, "doc_id", iterations = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // it1: r2 = 37500000 + 17*(250000000 + 250000000)/20 = 462500000
    //      r1 = r3 = 37500000 + 17*(250000000/2)/20 = 143750000
    //      r4 = 37500000
    // it2: r2 = 37500000 + 17*(143750000 + 143750000)/20 = 281875000
    //      r1 = r3 = 37500000 + (17*(462500000/2)) DIV 20 = 234062500
    assert(r(2L) === 281875000L)
    assert(r(1L) === 234062500L)
    assert(r(3L) === 234062500L)
    assert(r(4L) === 37500000L)
  }

  test("total rank mass never exceeds 1e9 (dangling mass is dropped, not re-added)") {
    val r5 = GraphRank.pageRank(nodes, edges, "doc_id", iterations = 5)
      .agg(sum($"rank_nano")).head().getLong(0)
    assert(r5 <= 1000000000L && r5 > 0L)
  }

  test("the hub of a star graph outranks the leaves") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val ns = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val r = GraphRank.pageRank(ns, star, "doc_id", iterations = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((2L to 5L).forall(l => r(1L) > r(l)))
    assert((3L to 5L).forall(l => r(2L) === r(l))) // symmetric leaves tie exactly
  }

  test("isolated-only graph: every node keeps the base rank each iteration") {
    val r = GraphRank.pageRank(Seq(7L, 8L).toDF("doc_id"),
        spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b"),
        "doc_id", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(7L) === 75000000L && r(8L) === 75000000L) // 150000000/2
  }

  test("edgesWithinNodes skips the defensive semi-join but computes identical ranks " +
      "when the assertion holds") {
    val a = GraphRank.pageRank(nodes, edges, "doc_id", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = GraphRank.pageRank(nodes, edges, "doc_id", iterations = 3,
        edgesWithinNodes = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("edge endpoints outside the node frame never contribute or appear " +
      "(the r14 active-set iteration keeps the old per-iteration-join semantics)") {
    // node 9 exists only in an edge: it must not seed rank mass, not feed
    // back into later iterations, and not appear in the output; node 2's
    // degree still counts the foreign edge (dangling-mass drop).
    // Hand-computed integer fixed point, old formulation, n=3, 2 iters:
    //  r0 = 333333333, base = 50000000, deg(1)=1, deg(2)=2
    //  i1: c(1)=166666666, c(2)=333333333       (src 9 has no rank row)
    //  i2: c(1)=166666666, c(2)=191666666
    //  r2(1)=50000000+17*166666666 div 20=191666666
    //  r2(2)=50000000+17*191666666 div 20=212916666, r2(3)=base
    val r = GraphRank.pageRank(Seq(1L, 2L, 3L).toDF("doc_id"),
        Seq((1L, 2L), (2L, 9L)).toDF("id_a", "id_b"),
        "doc_id", iterations = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 191666666L, 2L -> 212916666L, 3L -> 50000000L))
  }
}
