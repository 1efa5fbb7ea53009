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
    * nodes keep the base rank. Returns `(idCol, rank_nano)`.
    *
    * `edgesWithinNodes = true` asserts every edge endpoint is a member
    * of `nodes` (e.g. a similarity self-join over the node table — the
    * declared pagerank keys' shape) and skips the defensive adjacency
    * semi-join that otherwise enforces the every-node contract against
    * foreign endpoints. */
  def pageRank(nodes: DataFrame, edges: DataFrame, idCol: String,
      iterations: Int = 5, edgesWithinNodes: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val ids = nodes.select(col(idCol)).distinct()
    val n = ids.count()
    require(n > 0, "pageRank needs a non-empty node frame")
    val und = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // src restricted to NODES once, before the checkpoint: an edge
    // endpoint outside `nodes` must never contribute (the old shape
    // dropped its rank row via the per-iteration ids join; here the
    // row never enters the iteration). deg still counts ALL und rows
    // first, so a node's out-mass to foreign endpoints is lost exactly
    // as before (the documented dangling-mass drop). Skipped entirely
    // when the caller proves the endpoints are nodes by construction.
    val adjRows = und.join(deg, "src")
    val adj = (if (edgesWithinNodes) adjRows
      else adjRows.join(ids.withColumnRenamed(idCol, "src"), Seq("src"), "left_semi"))
      .localCheckpoint(true)
    val base = 150000000L / n
    // Iterate over ACTIVE nodes only (degree >= 1 — adj's src set, which
    // in the undirected expansion equals its dst set, so every active
    // node receives a contribution row every round and needs no outer
    // join). Isolated nodes receive nothing forever — their rank is the
    // constant `base` after any iteration — so they re-attach ONCE at
    // the end instead of riding a per-iteration left join. Same rows to
    // the bit (integer arithmetic throughout); the old shape re-scanned
    // and re-distinct'ed the node frame inside every iteration — 5 extra
    // scans + exchanges in the unrolled plan (guide §2.4: remove
    // shuffles outright; the per-iteration plan is now ONE equi-join +
    // ONE aggregate, the fundamental minimum for pull-based PageRank).
    var ranks = adj.select(col("src").as(idCol)).distinct()
      .select(col(idCol), lit(1000000000L / n).as("rank_nano"))
    for (_ <- 1 to iterations) {
      // invariant (r14 advice): with edgesWithinNodes=true a foreign dst
      // endpoint can acquire a rank row here — it is INERT (never a src
      // in adj, so it contributes to nobody) and drops at the final left
      // join; an edit to adj construction must preserve that src
      // semi-join property or re-enable the defensive node filter above
      val contrib = adj
        .join(ranks.withColumnRenamed(idCol, "src"), "src")
        .select(col("dst"), expr("rank_nano DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = contrib.select(col("dst").as(idCol),
        (lit(base) + expr("(17 * s) DIV 20")).as("rank_nano"))
    }
    ids.join(ranks, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("rank_nano"), lit(base)).as("rank_nano"))
  }
}
