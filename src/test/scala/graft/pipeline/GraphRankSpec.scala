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
}
