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

  test("planted embeddings fixture: builder plants replay the oracle CTE's f32 arithmetic") {
    // The ivfpq planted oracles' CTE (IndexQueries.plantedEmbCte) uses
    // DuckDB-only table functions, so it can't be replayed through Spark
    // SQL like the documents fixture above. Instead both sides pin to
    // the same spec-level ground truth: plant (q, i) is the query vector
    // with dim 0 = f32(qv[0] + f32(0.001·i)) — the CTE's
    // CAST(double + CAST(0.001*i AS FLOAT) AS FLOAT) is exactly IEEE
    // f32 + f32 (the sum is exact in f64, then rounds once) — and plant
    // ids are 1e6·(query_id+1)+i for query_ids 0..2.
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val corpus = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val fix = IndexQueries.plantedEmbeddings(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(fix.size === corpus.size + 30, "corpus + 10 plants x 3 queries")
    for (qid <- 0L to 2L; i <- 1 to 10) {
      val qv = corpus(qid)
      val plant = fix(1000000L * (qid + 1) + i)
      assert(plant.length === qv.length)
      assert(plant(0) === qv(0) + (0.001 * i).toFloat,
        s"plant($qid,$i) dim 0 must be f32(qv0 + f32(0.001*$i))")
      assert(plant.drop(1).toSeq === qv.drop(1).toSeq,
        s"plant($qid,$i) must only perturb dim 0")
    }
    // corpus rows pass through unchanged
    assert(corpus.forall { case (id, v) => fix(id).toSeq == v.toSeq })
  }
}
