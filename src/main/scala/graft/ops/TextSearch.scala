package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Pluggable text→vector embedding (reference: Neighborly/EmbeddingGenerator.cs).
  * The production reference chains ML.NET word embeddings or an Ollama HTTP
  * call with a deterministic hash-seeded fallback; only the fallback is
  * reproducible without models or network, so it is the default provider
  * here (EmbeddingGenerator.cs:139-156) and the other two are intentional
  * extension points.
  */
trait EmbeddingProvider extends Serializable {
  def dimension: Int
  def embed(text: String): Array[Float]
}

/** Deterministic hash-seeded provider (EmbeddingGenerator.cs:139-156):
  * seed = text hash, uniform values in [-1, 1), cached dimension (default
  * 300 in the reference; configurable here because the vector table's
  * dimension rules). Deviation (declared): JVM `String.hashCode` replaces
  * C# `GetHashCode` — both are arbitrary stable hashes.
  */
final case class HashEmbeddingProvider(dimension: Int = 300) extends EmbeddingProvider {
  def embed(text: String): Array[Float] = {
    val rnd = new java.util.Random(text.hashCode)
    Array.fill(dimension)((rnd.nextDouble() * 2 - 1).toFloat)
  }
}

/** HTTP embedding provider — the Spark analog of the reference's Ollama
  * client (Neighborly/EmbeddingGenerator.cs:36-100: POST {"model","prompt"}
  * to /api/embeddings, read {"embedding":[...]}; the reference falls back
  * to the hash provider when the endpoint fails, `:84-99`).
  *
  * Same wire contract here, on the JDK HTTP client (no extra deps):
  * per-call on the driver for query embedding, and `embedAll` for the
  * distributed corpus path — a `mapPartitions` stage that reuses ONE
  * client per partition and walks the iterator in order (the batched
  * shape a real embedding service wants; no shuffle, partitioning
  * preserved). Failures fall back to the deterministic hash embedding,
  * reference-parity.
  */
final case class HttpEmbeddingProvider(endpoint: String, model: String,
    dimension: Int = 300, timeoutMs: Int = 10000) extends EmbeddingProvider {

  @transient private lazy val fallback = HashEmbeddingProvider(dimension)

  def embed(text: String): Array[Float] =
    try {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong)).build()
      requestOne(client, text)
    } catch { case scala.util.control.NonFatal(_) => fallback.embed(text) }

  private def requestOne(client: java.net.http.HttpClient, text: String): Array[Float] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val body = mapper.createObjectNode()
    body.put("model", model); body.put("prompt", text)
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"embedding endpoint returned ${resp.statusCode()}")
    val arr = mapper.readTree(resp.body()).get("embedding")
    require(arr != null && arr.isArray, "embedding endpoint response missing 'embedding' array")
    Array.tabulate(arr.size())(i => arr.get(i).floatValue())
  }

  /** Distributed corpus embedding: one HTTP client per partition, rows in
    * iterator order — append `outCol ARRAY<FLOAT>`. */
  def embedAll(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val self = this
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType), nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(self.timeoutMs.toLong)).build()
      it.map { row =>
        val vec =
          try self.requestOne(client, row.getString(idx))
          catch { case scala.util.control.NonFatal(_) => self.fallback.embed(row.getString(idx)) }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ vec.toSeq)
      }
    }(enc)
  }
}

/** Text-search composition (SearchService.cs:104-131):
  *  1. effective threshold = caller's or the length heuristic (<5 chars →
  *     0.9, <20 → 0.8, else 0.5 — `:82-102`);
  *  2. embed the text, vector kNN, threshold filter incl. the high-dim
  *     bypass (`:171-189`);
  *  3. for texts shorter than 20 chars, union case-insensitive
  *     prefix-matches (first k), values-distinct keeping the earliest
  *     occurrence (kNN results first — Vector.Equals is values-only,
  *     Vector.cs:419-435), take k (`:121-127`).
  *
  * Determinism normalization (declared): the reference's prefix matches
  * arrive in insertion order; the distributed analog orders them by id.
  * Output is (id, ord) where ord = priority*1000 + position — priority 0
  * for kNN hits in rank order, 1 for prefix matches in id order — so the
  * oracle can replay the exact union/distinct/take sequence.
  */
object TextSearch {

  /** `knnFn`, when given, supplies the vector-search stage — (query, k) →
    * (id, dist) candidates — so the facade can dispatch the embedded query
    * through its `SearchAlgorithm` family (LSH/HNSW/BQ/PQ/Range), exactly
    * as the reference's Search(text) calls Search(query, k, method)
    * (SearchService.cs:104-131). Default: the exact linear scan. */
  def search(vectors: DataFrame, idCol: String, vecCol: String, textCol: String,
      queryText: String, k: Int, provider: EmbeddingProvider,
      threshold: Option[Double] = None,
      metric: String = "euclidean",
      knnFn: Option[(Array[Float], Int) => DataFrame] = None): DataFrame = {
    require(queryText != null && queryText.trim.nonEmpty, "Text cannot be null or empty")
    val thr = threshold.getOrElse(ThresholdFilter.defaultThreshold(queryText))
    val q = provider.embed(queryText)

    val w = org.apache.spark.sql.expressions.Window
    val knnRanked = knnFn match {
      case None =>
        Knn.withDistance(vectors, vecCol, typedLit(q), metric)
          .select(col(idCol), col(vecCol), col("dist"))
          .orderBy(col("dist"), col(idCol))
          .limit(k)
          .withColumn("ord", row_number().over(w.orderBy(col("dist"), col(idCol))).cast("long"))
      case Some(f) =>
        // dispatched stage returns (id, dist); fetch values back by id for
        // the values-distinct union below
        f(q, k)
          .join(vectors.select(col(idCol), col(vecCol)), idCol)
          .orderBy(col("dist"), col(idCol))
          .limit(k)
          .withColumn("ord", row_number().over(w.orderBy(col("dist"), col(idCol))).cast("long"))
    }
    val knn = ThresholdFilter(knnRanked, "dist", thr, provider.dimension)
      .select(col(idCol), col(vecCol), col("ord"))

    if (queryText.length >= 20) {
      knn.select(col(idCol), col("ord")).orderBy(col("ord")).limit(k)
    } else {
      val prefix = vectors
        .filter(lower(col(textCol)).startsWith(lit(queryText.toLowerCase)))
        .select(col(idCol), col(vecCol))
        .orderBy(col(idCol))
        .limit(k)
        .withColumn("ord", lit(1000L) + row_number().over(w.orderBy(col(idCol))).cast("long"))
      val both = knn.unionByName(prefix)
      // values-only Distinct(): keep the earliest occurrence per VALUES
      // (not per id — two ids with identical floats collapse, Vector.cs:419-435)
      val firstPerValue = both.groupBy(col(vecCol)).agg(min(col("ord")).as("ord"))
      both.join(firstPerValue, Seq(vecCol, "ord"))
        .select(col(idCol), col("ord"))
        .orderBy(col("ord"))
        .limit(k)
    }
  }
}
