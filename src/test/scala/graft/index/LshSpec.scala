package graft.index

import graft.SparkSpec
import graft.functions.LshCodesExpr
import graft.ops.Knn
import org.apache.spark.sql.functions._

class LshSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val emb001 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  // the reference's recall fixture shape: 2000 × 64d (HNSWBenchmarkTests.cs:33-49)
  private lazy val emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()

  test("adaptive params follow LSHSearch.cs:228-230 clamps") {
    assert(LshParams.adaptive(64) === LshParams(64, 8, 6, 42))
    assert(LshParams.adaptive(1000) === LshParams(1000, 20, 15, 42))
    assert(LshParams.adaptive(10) === LshParams(10, 8, 6, 42))
  }

  test("LshCodesExpr (codegen) matches driver-side codesLocal") {
    val p = LshParams.adaptive(64)
    val rows = Lsh.withCodes(emb001, "embedding", p).select($"vec_id", $"embedding", $"codes").collect()
    rows.take(40).foreach { r =>
      val local = p.codesLocal(r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      assert(r.getAs[scala.collection.Seq[Long]]("codes") === local.toSeq, s"vec ${r.getLong(0)}")
    }
  }

  test("projection generation is deterministic per seed") {
    val a = LshParams(64, 2, 3, 42); val b = LshParams(64, 2, 3, 42)
    assert(a.projections.map(_.toSeq).toSeq === b.projections.map(_.toSeq).toSeq)
    assert(a.biases.toSeq === b.biases.toSeq)
    val c = LshParams(64, 2, 3, 7)
    assert(a.projections(0).toSeq !== c.projections(0).toSeq)
  }

  test("self-query always finds itself (self-collision in every table)") {
    val q = emb001.filter($"vec_id" === 1).head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val out = Lsh.search(emb001, "vec_id", "embedding", q, k = 3, LshParams.adaptive(64)).collect()
    assert(out.head.getAs[Long]("vec_id") === 1L)
    assert(out.head.getAs[Double]("dist") === 0.0)
  }

  test("recall >= 0.8 vs exact kNN on the 2000x64 fixture (reference bar, HNSWBenchmarkTests.cs:169)") {
    val p = LshParams.serving(64)
    val queries = emb01.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val exact = Knn.batch(emb01, "vec_id", "embedding", queries, "query_id", "qv", k = 10)
      .select($"query_id", $"vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Lsh.searchBatch(emb01, "vec_id", "embedding", queries, "query_id", "qv", k = 10, p)
      .select($"query_id", $"vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall over 20 queries: $mean%.3f")
    assert(mean >= 0.8, f"mean recall $mean%.3f below the 0.8 bar")
  }

  test("batch and single agree on a shared query") {
    val p = LshParams.adaptive(64)
    val q0 = emb001.filter($"vec_id" === 0).head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val single = Lsh.search(emb001, "vec_id", "embedding", q0, k = 5, p)
      .select($"vec_id", $"dist").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val queries = emb001.filter($"vec_id" === 0).select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val batch = Lsh.searchBatch(emb001, "vec_id", "embedding", queries, "query_id", "qv", k = 5, p)
      .orderBy($"rank").select($"vec_id", $"dist").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(single === batch)
  }
}
