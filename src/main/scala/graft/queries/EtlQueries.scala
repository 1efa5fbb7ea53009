package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.io.{ContentType, Etl}

/** ETL round-trip surface (SURVEY §2.1). Each query materializes a vector
  * table from `embeddings`, exports it in one format, re-imports, and
  * reduces every field to engine-stable scalars (magnitude / sizes / sums)
  * — the oracle computes the same scalars from the original table, so any
  * precision or content loss in the round-trip hash-mismatches. This is the
  * distributed analog of the reference's ETL golden tests
  * (Tests/ETLTest.cs:8-49).
  *
  * Bench label: these queries measure EXPORT + IMPORT + reduce — the write
  * is inside the timed body by design (it IS the operator under test), so
  * their bench numbers are round-trip times, not scan times.
  */
object EtlQueries {

  /** ETL-shaped vector table derived deterministically from embeddings:
    * every ETL field (id / values / tags / original_text) populated. */
  private def vectorTable(s: org.apache.spark.sql.SparkSession, dir: String) =
    table(s, dir, "embeddings").select(
      col("vec_id").cast("string").as("id"),
      col("embedding").as("values"),
      array(col("label").cast("short"), (col("vec_id") % 7).cast("short")).as("tags"),
      concat(lit("vec "), col("vec_id")).as("original_text"))

  private def rt(ct: ContentType, name: String): Q = (s, dir) => {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_etl/${name}_${new java.io.File(dir).getName}"
    Etl.roundTrip(vectorTable(s, dir), ct, out)
      .select(
        col("id").cast("long").as("vec_id"),
        size(col("values")).cast("long").as("n_values"),
        round(Distances.magnitude(col("values")), 6).as("mag"),
        aggregate(col("tags"), lit(0L), (a, x) => a + x).as("tag_sum"),
        length(col("original_text")).cast("long").as("text_len"))
  }

  val defs: Map[String, Q] = Map(
    "etl_csv_roundtrip" -> rt(ContentType.CSV, "csv"),
    "etl_json_roundtrip" -> rt(ContentType.JSON, "json"),
    "etl_jsonz_roundtrip" -> rt(ContentType.JSONZ, "jsonz"),
    "etl_parquet_roundtrip" -> rt(ContentType.Parquet, "parquet"),
    "etl_orc_roundtrip" -> rt(ContentType.ORC, "orc"))

  private val oracle =
    s"""SELECT vec_id AS vec_id,
       | CAST(len(embedding) AS BIGINT) AS n_values,
       | round(${sqlMagnitude("embedding")}, 6) AS mag,
       | CAST(label + (vec_id % 7) AS BIGINT) AS tag_sum,
       | CAST(length('vec ' || CAST(vec_id AS VARCHAR)) AS BIGINT) AS text_len
       |FROM embeddings""".stripMargin

  val oracles: Map[String, String] = Map(
    "etl_csv_roundtrip" -> oracle,
    "etl_json_roundtrip" -> oracle,
    "etl_jsonz_roundtrip" -> oracle,
    "etl_parquet_roundtrip" -> oracle,
    "etl_orc_roundtrip" -> oracle)
}
