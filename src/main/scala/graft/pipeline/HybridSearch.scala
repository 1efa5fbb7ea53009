package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval via Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher, "Reciprocal Rank Fusion outperforms
  * Condorcet and individual rank learning methods", SIGIR 2009) — the
  * standard way a retrieval pipeline combines a BM25 ranking with an
  * embedding kNN without score calibration: rrf(d) = Σ_r 1/(c + rank_r(d)).
  *
  * Build-brief extension (the reference searches text OR vectors, never
  * fused). Determinism discipline: both input rankings use the engine's
  * canonical tie-breaks (rounded score desc / rounded dist asc, then id),
  * ranks are integers, and the fused sum is a fixed-order two-term add of
  * exact IEEE doubles `1/(c+rank)` rounded to 6 — so a SQL oracle replays
  * the whole fusion.
  *
  * Scale shape: each ranking is a bounded pool (`poolSize` rows after its
  * own top-k machinery), so the fusion join is a trivially-broadcast
  * constant-size frame regardless of corpus size.
  */
object HybridSearch {

  /** Attach 1-based ranks to a bounded, already-ordered pool. The window
    * is single-partition by construction — the pool is `limit`ed first. */
  private def ranked(pool: DataFrame, idCol: String, orderCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    pool.withColumn("rank", row_number().over(Window.orderBy(orderCols: _*)))

  /** Fuse two (id, rank) pools: rrf = 1/(c+rank_a) + 1/(c+rank_b), absent
    * ranks contribute 0. Returns (id, rrf) ordered by (rrf desc, id). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
      c: Double = 60.0): DataFrame = {
    val sa = a.select(col(idCol), (lit(1.0) / (lit(c) + col("rank"))).as("_ra"))
    val sb = b.select(col(idCol), (lit(1.0) / (lit(c) + col("rank"))).as("_rb"))
    sa.join(sb, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(coalesce(col("_ra"), lit(0.0)) + coalesce(col("_rb"), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** End-to-end hybrid search over a corpus with aligned document ids:
    * BM25 pool on `docs(textCol)` for `queryTerms`, exact-kNN pool on
    * `vectors(vecCol)` for `queryVec`, RRF-fused top-k. */
  def search(docs: DataFrame, idCol: String, textCol: String, queryTerms: Seq[String],
      vectors: DataFrame, vecIdCol: String, vecCol: String, queryVec: Array[Float],
      k: Int, poolSize: Int = 50, c: Double = 60.0,
      bm25Stats: Option[(Long, Double)] = None): DataFrame = {
    val lexPool = Bm25.score(docs, idCol, textCol, queryTerms, stats = bm25Stats)
      .orderBy(col("bm25").desc, col(idCol)).limit(poolSize)
    val lex = ranked(lexPool, idCol, Seq(col("bm25").desc, col(idCol)))
      .select(col(idCol), col("rank"))
    val vecPool = graft.ops.Knn.single(vectors, vecIdCol, vecCol,
      typedLit(queryVec.toSeq), poolSize)
    val vec = ranked(vecPool, vecIdCol, Seq(col("dist"), col(vecIdCol)))
      .select(col(vecIdCol).as(idCol), col("rank"))
    rrfFuse(lex, vec, idCol, k, c)
  }
}
