package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The COLD HNSW serving substitution, bar-pinned: before the first
  * `buildAllIndexes`, the HNSW algorithm name is served by recall-tuned
  * LSH (`LshParams.serving`) — a declared deviation (SURVEY §8). This
  * spec holds that substitution to the same recall ≥ 0.8 bar the warm
  * true-graph path is held to (the reference's own,
  * Tests/HNSWBenchmarkTests.cs:169), on the 2000×64 sf0.1 config the
  * deviation note cites — pinned, not just declared (r7 verdict item 7). */
class ColdHnswServingSpec extends SparkSpec {
  import sqlImplicits._

  test("cold HNSW (pre-build LSH substitution) meets mean recall >= 0.8 on 2000x64") {
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    val db = new NeighborlySpark(spark, 64)
    db.addVectors(emb.select(
      format_string("%d", $"vec_id").as("id"),
      $"embedding".as("values"),
      array().cast("array<smallint>").as("tags"),
      lit("").as("original_text"),
      lit(0).cast("tinyint").as("priority"),
      lit(0L).as("user_id"), lit(0L).as("org_id")))

    // exact truth for 20 queries in ONE distributed bounded-heap job
    val qs = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val truth = graft.ops.Knn.batch(emb, "vec_id", "embedding",
        qs, "query_id", "qv", k = 10)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }

    val queries = qs.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("qv").toArray)
    val recalls = queries.map { case (qid, q) =>
      // cold path: NO buildAllIndexes has run; threshold wide-open so
      // the quirk filter keeps all k rows
      val got = db.search(q, 10, SearchAlgorithm.HNSW,
          similarityThreshold = Double.MaxValue)
        .collect().map(_.getString(0).toLong).toSet
      got.intersect(truth(qid)).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    info(f"cold-HNSW (serving LSH) mean recall@10: $mean%.2f over ${recalls.length} queries")
    assert(mean >= 0.8, f"cold-path recall $mean%.2f below the 0.8 bar")
    db.close()
  }
}
