package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic bounded sampling for index training (PQ / IVF codebooks).
  *
  * At 100 TB a codebook fit must never funnel the whole table through the
  * single training partition; standard practice is to train on a few
  * hundred thousand rows. The sample must also be deterministic across
  * sessions, cluster sizes and input split orders, because the fitted
  * centers feed oracle-checked query results.
  */
object Sampling {

  /** When the table exceeds `cap` rows, keep the `cap` rows ranked first
    * by `xxhash64(vector, seed)` (ties broken by a second seeded hash) —
    * a pseudo-random but fully deterministic choice, independent of
    * partitioning. Spark plans `orderBy(...).limit(cap)` as a
    * TakeOrderedAndProject: each input task keeps a local top-`cap` heap
    * and only `cap` rows ever reach a single JVM, so the downstream
    * `coalesce(1)` training stage is bounded no matter the table size.
    * Tables at or under the cap pass through untouched (preserving the
    * established fitted centers for small data). */
  def seededSample(vectors: DataFrame, vecCol: String, n: Long, cap: Int, seed: Long): DataFrame =
    if (cap > 0 && n > cap)
      vectors.orderBy(xxhash64(col(vecCol), lit(seed)), xxhash64(col(vecCol), lit(seed + 1)))
        .limit(cap)
    else vectors
}
