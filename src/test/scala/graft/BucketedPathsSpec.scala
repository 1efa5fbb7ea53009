package graft

import graft.io.BucketedTables
import graft.pipeline.GraphRank
import org.apache.spark.sql.functions._

/** Exchange-elimination pins for the opt-in bucketed storage
  * ([[graft.io.BucketedTables]]) on the two paths the r11 verdict named:
  * PageRank's node frame and a dedup keep anti-join. Each pin asserts
  * BOTH the dropped exchange and bit-identical results vs the
  * unbucketed (oracle-gated) path.
  */
class BucketedPathsSpec extends SparkSpec {
  import sqlImplicits._

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  private def withSmj[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force sort-merge joins and a static plan so the assertion is
      // about bucket co-location, not AQE's runtime election
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      body
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("pagerank: bucketed node frame drops the per-iteration node-join exchange") {
    val nodes = (0L until 40L).toDF("id")
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    spark.sql("DROP TABLE IF EXISTS g_nodes_bucketed")
    BucketedTables.save(nodes, "g_nodes_bucketed", "id", buckets = 4)
    try withSmj {
      val plain = GraphRank.pageRank(nodes, edges, "id", iterations = 2)
      val bucketed = GraphRank.pageRank(
        BucketedTables.load(spark, "g_nodes_bucketed"), edges, "id", iterations = 2)
      val ePlain = exchanges(plain.queryExecution.executedPlan.toString)
      val eBucketed = exchanges(bucketed.queryExecution.executedPlan.toString)
      // one node-frame co-partition exchange per iteration drops, plus
      // the initial distinct's — strictly fewer is the contract
      assert(eBucketed < ePlain,
        s"bucketed node frame must shed exchanges: $eBucketed vs $ePlain")
      // results bit-identical to the unbucketed (oracle-gated) path
      val a = plain.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val b = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(a.toSeq === b.toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS g_nodes_bucketed")
  }

  test("dedup keep anti-join: bucketed corpus side reads buckets, no exchange") {
    val docs = (0L until 60L).map(i => (i, s"doc $i", i % 7)).toDF("doc_id", "text", "grp")
    val dupIds = Seq(3L, 9L, 12L).toDF("doc_id")
    spark.sql("DROP TABLE IF EXISTS g_docs_bucketed")
    BucketedTables.save(docs, "g_docs_bucketed", "doc_id", buckets = 4)
    try withSmj {
      def keep(corpus: org.apache.spark.sql.DataFrame) =
        corpus.join(dupIds, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("grp"))
      val plain = keep(docs)
      val bucketed = keep(BucketedTables.load(spark, "g_docs_bucketed"))
      val planB = bucketed.queryExecution.executedPlan.toString
      // the CORPUS side must carry no exchange: its only shuffle need is
      // satisfied by the bucketing; the skinny dup-id side still shuffles
      assert(exchanges(planB) < exchanges(plain.queryExecution.executedPlan.toString))
      assert(exchanges(planB) <= 1, s"only the dup-id side may shuffle:\n${planB.take(1200)}")
      assert(plain.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ===
        bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS g_docs_bucketed")
  }
}
