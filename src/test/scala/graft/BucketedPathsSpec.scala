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

  test("dedup keep equi-join (merge-hinted): bucketed corpus side sheds its exchange") {
    // the dedup_exact_keep_smj / _bucketed twin shape: keep ids derive
    // from the corpus itself (min id per content hash), the corpus
    // joins back on doc_id under a merge hint (the at-scale plan — a
    // corpus-sized keep side never broadcasts)
    val docs = (0L until 60L).map(i => (i, s"doc ${i % 40}", i)).toDF("doc_id", "text", "n_chars")
    spark.sql("DROP TABLE IF EXISTS g_keep_bucketed")
    io.BucketedTables.save(docs, "g_keep_bucketed", "doc_id", buckets = 4)
    try {
      def keep(corpus: org.apache.spark.sql.DataFrame) = {
        val keeps = pipeline.Dedup.exactGroups(corpus, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        corpus.hint("merge").join(keeps, Seq("doc_id"))
          .select(col("doc_id"), col("n_chars"))
      }
      val plain = keep(docs)
      val bucketed = keep(io.BucketedTables.load(spark, "g_keep_bucketed"))
      val eP = exchanges(plain.queryExecution.executedPlan.toString)
      val eB = exchanges(bucketed.queryExecution.executedPlan.toString)
      assert(eB < eP, s"bucketed corpus must shed its join exchange: $eB vs $eP")
      assert(plain.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ===
        bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS g_keep_bucketed")
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
