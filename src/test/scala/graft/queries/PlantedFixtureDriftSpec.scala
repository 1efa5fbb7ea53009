package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drift guard for the planted-fixture oracles (VERDICT r5 item 5): the
  * fixture exists twice — as the Scala builder the three `_planted`
  * queries run ([[PipelineQueries.plantedDocs]]) and as the DuckDB CTE
  * text embedded in their oracle SQL ([[PipelineQueries.fixtureCte]]).
  * A silent edit to either side voids the oracles while leaving both
  * "green" in isolation, so this spec replays the CTE TEXT itself
  * through Spark SQL and pins row-for-row equality against the builder.
  *
  * One dialect shim, applied mechanically to the text: DuckDB spells
  * replace-all as an explicit `'g'` flag argument, which Spark's
  * 3-argument `regexp_replace` (global by default) doesn't parse — the
  * shim strips exactly that trailing flag argument and nothing else, so
  * every other token of the CTE is executed as written. */
class PlantedFixtureDriftSpec extends SparkSpec {

  test("planted fixture: the Scala builder and the oracle CTE text agree row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.createOrReplaceTempView("documents")
    try {
      // DuckDB→Spark shim: drop the explicit global-replace flag (Spark
      // regexp_replace is always global); the rest of the text runs verbatim
      val cte = PipelineQueries.fixtureCte.replace(", 'g')", ")")
      assert(cte != PipelineQueries.fixtureCte,
        "the CTE no longer carries the 'g' flag — update the shim AND DuckDB side together")
      val fromSql = spark.sql(s"WITH $cte SELECT doc_id, text FROM fixture")
      val fromScala = PipelineQueries.plantedDocs(spark, dir)

      def fingerprint(df: org.apache.spark.sql.DataFrame) = {
        val r = df.agg(
          count(lit(1)),
          coalesce(sum(xxhash64(col("doc_id"), col("text")).cast("decimal(38,0)")),
            lit(java.math.BigDecimal.ZERO))).head()
        (r.getLong(0), r.getDecimal(1))
      }
      val (sqlCount, sqlHash) = fingerprint(fromSql)
      val (scalaCount, scalaHash) = fingerprint(fromScala)
      assert(sqlCount > 0, "fixture CTE produced no rows")
      assert(scalaCount === sqlCount,
        s"builder rows $scalaCount != CTE rows $sqlCount — the two fixtures drifted")
      assert(scalaHash === sqlHash,
        "builder and CTE row contents differ — the two fixtures drifted")
      // and row-for-row, not just in aggregate (exceptAll is symmetric-empty)
      assert(fromScala.exceptAll(fromSql).isEmpty && fromSql.exceptAll(fromScala).isEmpty)
    } finally spark.catalog.dropTempView("documents")
  }
}
