package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSearchSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val vectors = {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e.join(d, $"vec_id" === $"doc_id").select($"vec_id", $"embedding", $"text").cache()
  }
  private val provider = HashEmbeddingProvider(64)

  test("hash provider is deterministic per text, dim-300 default (EmbeddingGenerator.cs:147)") {
    assert(HashEmbeddingProvider().dimension === 300)
    val a = provider.embed("hello"); val b = provider.embed("hello")
    assert(a.toSeq === b.toSeq)
    assert(provider.embed("hello").toSeq !== provider.embed("world").toSeq)
    assert(a.length === 64)
    assert(a.forall(v => v >= -1f && v < 1f))
  }

  test("default threshold heuristic: <5 -> 0.9, <20 -> 0.8, else 0.5") {
    assert(ThresholdFilter.defaultThreshold("abc") === 0.9)
    assert(ThresholdFilter.defaultThreshold("a dozen chars") === 0.8)
    assert(ThresholdFilter.defaultThreshold("twenty characters or more") === 0.5)
  }

  test("short query unions prefix matches after the kNN block (ord encodes origin)") {
    val out = TextSearch.search(vectors, "vec_id", "embedding", "text",
      "the ", k = 10, provider, threshold = Some(6.0)).collect()
    assert(out.nonEmpty && out.length <= 10)
    val ords = out.map(_.getAs[Long]("ord"))
    // the generous threshold keeps the kNN block (ord < 1000); prefix matches follow (>1000)
    assert(ords.exists(_ < 1000L))
    // ascending, deduped
    assert(ords.toSeq === ords.sorted.toSeq)
  }

  test("short query with default threshold filters kNN to prefix-only results") {
    val out = TextSearch.search(vectors, "vec_id", "embedding", "text",
      "the", k = 10, provider).collect()
    assert(out.forall(_.getAs[Long]("ord") > 1000L))
  }

  test("long query skips the prefix union entirely") {
    val out = TextSearch.search(vectors, "vec_id", "embedding", "text",
      "the quick brown fox jumps", k = 5, provider, threshold = Some(20.0)).collect()
    assert(out.length === 5)
    assert(out.forall(_.getAs[Long]("ord") < 1000L))
  }

  test("blank text is rejected (SearchService.cs:106-109)") {
    intercept[IllegalArgumentException](
      TextSearch.search(vectors, "vec_id", "embedding", "text", "  ", 5, provider))
  }
}
