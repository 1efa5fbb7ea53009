package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Opt-in bucketed storage for the heavy iterative/join paths (r11
  * verdict item 7): write a frame as a Spark managed table bucketed AND
  * sorted on its join key, so every downstream equi-join / aggregate on
  * that key reads buckets pairwise with NO shuffle exchange on the
  * bucketed side. This is the storage-level form of the engine's
  * co-location prescription — at 100 TB the win is per-QUERY shuffle
  * elimination bought once at write time:
  *
  *  - `documents` bucketed by `doc_id` → dedup keep/anti joins,
  *    decontamination keep-joins and per-doc reassembly joins skip the
  *    corpus-side exchange;
  *  - a node/rank frame bucketed by the node id → one of PageRank's
  *    three per-iteration exchanges drops out
  *    ([[graft.pipeline.GraphRank]], exchange #3 — the node frame's
  *    co-partition for the left join);
  *  - `vectors`/`embeddings` bucketed by id → index↔table re-rank joins
  *    skip the table-side exchange.
  *
  * Plan pins live in `BucketedPathsSpec` (exchange count drops, results
  * bit-identical). Bucket count should match the downstream
  * `spark.sql.shuffle.partitions` regime (buckets ≪ partitions wastes
  * parallelism; buckets ≫ executor count wastes small files).
  */
object BucketedTables {

  /** Write `df` as managed table `name`, bucketed+sorted on `key`. */
  def save(df: DataFrame, name: String, key: String, buckets: Int = 32): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(name)
  }

  /** Read a bucketed table back; the bucketing metadata rides the
    * catalog entry, so joins/aggregates on the bucket key skip their
    * exchange without caller cooperation. */
  def load(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
