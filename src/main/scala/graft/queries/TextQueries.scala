package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{HashEmbeddingProvider, TextSearch, ThresholdFilter}

/** Text-search composition queries (SURVEY §2.8 "Text search",
  * SearchService.cs:104-131). The vector table is embeddings ⋈ documents
  * (vec_id = doc_id) so every vector carries an original_text; the oracle
  * embeds the same deterministic hash-provider query vector as a literal
  * and replays threshold → bypass → prefix-union → values-distinct → take-k.
  */
object TextQueries {

  private val provider = HashEmbeddingProvider(64)

  private def vectorsWithText(s: org.apache.spark.sql.SparkSession, dir: String) =
    table(s, dir, "embeddings")
      .join(table(s, dir, "documents"), col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("embedding"), col("text"))

  val defs: Map[String, Q] = Map(
    // Short text + a generous threshold keeps the kNN block,
    // and the prefix-union/distinct/take path runs (text < 20 chars).
    "text_search_short" -> ((s, dir) =>
      TextSearch.search(vectorsWithText(s, dir), "vec_id", "embedding", "text",
        "the ", k = 10, provider, threshold = Some(6.0))),

    // Short text + the length-heuristic default threshold (0.9 ≤ 1.5 → no
    // bypass): every kNN hit is filtered out at embedding-scale distances,
    // so the result is the prefix matches alone — the reference's actual
    // behavior for short queries with default settings.
    "text_search_prefix_only" -> ((s, dir) =>
      TextSearch.search(vectorsWithText(s, dir), "vec_id", "embedding", "text",
        "the", k = 10, provider)),

    // Long text (≥20 chars): no prefix union — pure kNN through the bypass.
    "text_search_long" -> ((s, dir) =>
      TextSearch.search(vectorsWithText(s, dir), "vec_id", "embedding", "text",
        "the quick brown fox jumps", k = 10, provider, threshold = Some(20.0))))

  /** Query embedding as a DuckDB literal; CAST to FLOAT[] first so both
    * engines widen the identical float32 bits to double. */
  private def qvLit(text: String): String =
    "CAST([" + provider.embed(text).map(f => java.lang.Float.toString(f)).mkString(",") +
      "] AS FLOAT[])"

  private def knnCtes(text: String, thr: Double, k: Int): String =
    s"""q AS (SELECT ${qvLit(text)} AS qv),
       |top AS (SELECT e.vec_id AS vec_id, ${sqlEuclid("e.embedding", "q.qv")} AS dist
       |        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id, q
       |        ORDER BY dist, vec_id LIMIT $k),
       |ranked AS (SELECT vec_id, dist,
       |             CAST(row_number() OVER (ORDER BY dist, vec_id) AS BIGINT) AS ord
       |           FROM top),
       |knn AS (SELECT vec_id, ord FROM ranked
       |        WHERE (SELECT max(dist) FROM top) > 5.0 AND $thr > 1.5 OR dist <= $thr)""".stripMargin

  private def prefixCte(prefix: String, k: Int): String =
    s"""prefix AS (SELECT vec_id, 1000 + CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS ord
       |           FROM (SELECT e.vec_id AS vec_id
       |                 FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
       |                 WHERE lower(d.text) LIKE '${prefix.toLowerCase}%'
       |                 ORDER BY e.vec_id LIMIT $k))""".stripMargin

  // values are unique per vec_id in this data, so the values-only Distinct
  // reduces to GROUP BY vec_id on the oracle side
  private def unionTail(k: Int): String =
    s"""u AS (SELECT * FROM knn UNION ALL SELECT * FROM prefix),
       |ded AS (SELECT vec_id, min(ord) AS ord FROM u GROUP BY vec_id)
       |SELECT vec_id, ord FROM ded ORDER BY ord LIMIT $k""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_search_short" ->
      s"""WITH ${knnCtes("the ", 6.0, 10)},
         |${prefixCte("the ", 10)},
         |${unionTail(10)}""".stripMargin,

    "text_search_prefix_only" ->
      s"""WITH ${knnCtes("the", ThresholdFilter.defaultThreshold("the"), 10)},
         |${prefixCte("the", 10)},
         |${unionTail(10)}""".stripMargin,

    "text_search_long" ->
      s"""WITH ${knnCtes("the quick brown fox jumps", 20.0, 10)}
         |SELECT vec_id, ord FROM knn ORDER BY ord LIMIT 10""".stripMargin)
}
