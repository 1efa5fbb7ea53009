package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank (Brin & Page, WWW 1998) over an undirected
  * edge list — the graph-centrality signal corpus curation ranks
  * documents by (a page held up by many near-duplicate or similar
  * neighbours is template mass; an authority hub is worth keeping).
  * Expressed as the classic Pregel-free Spark shape: per iteration one
  * equi-join of the adjacency against the current ranks and one
  * hash-partitioned aggregate of the contributions — no GraphX, no
  * driver-side graph.
  *
  * Numerics: ranks live in NANO-units (`Long`, Σ ≈ 1e9) and every step
  * is integer arithmetic — `r₀ = 1e9 DIV n`, out-contribution
  * `r DIV deg`, update `r' = (1−d)·1e9 DIV n + (17·Σcontrib) DIV 20`
  * (d = 17/20 = 0.85) — so contribution sums are order-free and a SQL
  * oracle replays every iteration bit-exactly; a floating formulation
  * would hit partial-agg sum reordering on the very first iteration.
  * Dangling mass (nodes without edges, and DIV remainders) is dropped,
  * not redistributed — the documented variant; both engines drop it
  * identically.
  *
  * Scale shape: the adjacency (edge + degree) is materialized ONCE
  * (eager localCheckpoint — it feeds every iteration, and re-deriving
  * the similarity join per iteration would multiply the mining cost by
  * the iteration count). Per iteration the plan audit shows three
  * linear exchanges — ranks re-key onto `src`, contributions shuffle
  * on `dst` (map-side partial sum), node frame co-partitions for the
  * left join — the classic Spark-SQL PageRank shape; with the node
  * frame bucketed by id the third one drops out. Iterations are lazily
  * chained — one job evaluates the whole unrolled plan, each stage
  * exactly once.
  */
object GraphRank {

  /** PageRank over `edges(id_a, id_b)` (undirected, expanded to both
    * directions here) for every node in `nodes(idCol)` — isolated
    * nodes keep the base rank. Returns `(idCol, rank_nano)`. */
  def pageRank(nodes: DataFrame, edges: DataFrame, idCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val n = nodes.select(col(idCol)).distinct().count()
    require(n > 0, "pageRank needs a non-empty node frame")
    val und = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adj = und.join(deg, "src").localCheckpoint(true)
    val ids = nodes.select(col(idCol)).distinct()
    var ranks = ids.select(col(idCol), lit(1000000000L / n).as("rank_nano"))
    val base = 150000000L / n
    for (_ <- 1 to iterations) {
      val contrib = adj
        .join(ranks.withColumnRenamed(idCol, "src"), "src")
        .select(col("dst"), expr("rank_nano DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = ids
        .join(contrib.withColumnRenamed("dst", idCol), Seq(idCol), "left")
        .select(col(idCol),
          (lit(base) + expr("(17 * coalesce(s, 0L)) DIV 20")).as("rank_nano"))
    }
    ranks
  }
}
