package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial-scale stress for the stars contraction (VERDICT r5 item 1 —
  * the one SCALING.md claim that had no empirical backing): a million-node
  * chain (worst-case diameter), a dense clique core, and a 10⁵-node
  * skewed community, pushed through `componentsStars` in one call.
  *
  * Pins the two 100 TB claims:
  *  - ROUND BOUND: convergence within 2·⌈log₂ n⌉ + 2 rounds (Kiveris et
  *    al. §3 — alternating stars are logarithmic even on paths), at a
  *    size that genuinely iterates (double digits of rounds, not the
  *    2-3 a toy graph settles in);
  *  - NO EDGE BLOW-UP: no round's canonical edge set ever exceeds 2×|E₀|
  *    (large-star emits ≤ 1 row per undirected edge; small-star ≤ 2), so
  *    a round can never amplify the shuffle volume — the structural
  *    reason the contraction survives 100× data.
  */
class ComponentsStressSpec extends SparkSpec {

  test("million-node chain + clique + skewed community: log rounds, no edge blow-up") {
    val n = 1000000L            // chain 1..n — diameter 10⁶
    val cBase = 2000000L        // complete graph on 1 000 nodes (~5·10⁵ edges)
    val cliqueN = 1000L
    val mBase = 3000000L        // 10⁵-node community, ~10 edges/node, hub-skewed
    val commN = 100000L

    val chain = spark.range(1L, n)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val cliqueIds = spark.range(cliqueN)
    val clique = cliqueIds.select(col("id").as("_i"))
      .crossJoin(broadcast(cliqueIds.select(col("id").as("_j"))))
      .filter(col("_i") < col("_j"))
      .select((col("_i") + cBase).as("id_a"), (col("_j") + cBase).as("id_b"))
    // every node j links to 10 hash-picked smaller nodes (pmod < j keeps
    // the graph connected by construction); low ids accumulate heavy
    // in-degree — the skew shape a hot dedup bucket feeds the contraction
    val community = spark.range(1L, commN)
      .select(col("id").as("_j"), explode(sequence(lit(1), lit(10))).as("_s"))
      .select((col("_j") + mBase).as("id_a"),
        (pmod(xxhash64(col("_j"), col("_s")), col("_j")) + mBase).as("id_b"))

    val edges = chain.unionByName(clique).unionByName(community)
    val comps = Dedup.connectedComponents(edges, "id_a", "id_b")

    // correctness: three components, each labeled by its minimum id —
    // verified distributedly (an aggregate over the 1.1M labels, not a
    // driver collect)
    val labeled = comps.withColumn("_exp",
      when(col("id") <= n, lit(1L))
        .when(col("id") >= mBase, lit(mBase))
        .otherwise(lit(cBase)))
    assert(labeled.filter(col("comp") =!= col("_exp")).count() === 0L)
    assert(comps.count() === n + cliqueN + commN)

    // round bound: logarithmic in the largest component (the chain), and
    // large enough to be a real iteration test, not a settle
    val rounds = Dedup.lastComponentRounds
    val bound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(n - 1)) + 2
    assert(Dedup.lastComponentConverged, s"did not converge in $rounds rounds")
    assert(rounds <= bound, s"took $rounds rounds on a $n-chain (bound $bound)")
    assert(rounds >= 10, s"only $rounds rounds — grow the fixture, this must iterate")

    // no round re-expands the edge set: every canonical count stays
    // within the structural 2×|E₀| envelope, and the tail monotonically
    // collapses toward the star forest
    val counts = Dedup.lastComponentEdgeCounts
    assert(counts.nonEmpty)
    val e0 = counts.head
    assert(counts.max <= 2 * e0,
      s"round edge counts ${counts.mkString(",")} blew past 2×|E0|=$e0")
  }
}
