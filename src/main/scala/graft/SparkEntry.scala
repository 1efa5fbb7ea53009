package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* grouped by domain; this object is the
  * merge point the driver reads.
  */
object SparkEntry {

  private val groups: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (RelationalQueries.defs, RelationalQueries.oracles),
    (VectorQueries.defs, VectorQueries.oracles),
    (IndexQueries.defs, IndexQueries.oracles),
    (EtlQueries.defs, EtlQueries.oracles),
    (TextQueries.defs, TextQueries.oracles),
    (MetaQueries.defs, MetaQueries.oracles),
    (PipelineQueries.defs, PipelineQueries.oracles),
    (ImageQueries.defs, ImageQueries.oracles),
    (UnigramQueries.defs, UnigramQueries.oracles),
    (AudioQueries.defs, AudioQueries.oracles),
    (UrlQueries.defs, UrlQueries.oracles),
    (WarcQueries.defs, WarcQueries.oracles),
    (VideoQueries.defs, VideoQueries.oracles),
    (LangQueries.defs, LangQueries.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
