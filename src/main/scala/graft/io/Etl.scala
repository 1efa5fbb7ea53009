package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Import/export layer (reference: the Neighborly/ETL package).
  *
  * Shared record shape `(Id, Values, Tags, OriginalText)` — attributes are
  * NOT round-tripped by the reference's ETL (EtlBase record shape;
  * Parquet.cs:46-58, Csv.cs:59, JSON.cs:33) and are not here either.
  *
  * Formats (EtlFactory.CreateEtl over ContentType — EtlFactory.cs:7-24):
  *  - CSV: header row, `;` field delimiter, arrays `,`-joined inside one
  *    field, blank lines skipped, values trimmed, UTF-8 (Csv.cs:15-24).
  *    Float/short round-trip is lossless (shortest-repr toString both ways).
  *  - JSON: objects with short keys {I, V, T, O} (JSON.cs:8-33). The
  *    reference writes one JSON array per file; a distributed engine writes
  *    JSON-lines per partition (declared deviation — import accepts both
  *    via multiLine).
  *  - JSONZ: the JSON format behind gzip (JSONZ.cs:8-14).
  *  - Parquet: native (Parquet.cs:12-60).
  *  - HDF5: declared but NotImplementedException in the reference
  *    (HDF5.cs:15-28) — kept enum-visible and rejected identically.
  *
  * Directory import accepts a directory of part files (the reference globs
  * `*{ext}` — EtlBase.cs:31-38; Spark's reader does the same natively).
  */
sealed abstract class ContentType(val extension: String)
object ContentType {
  case object CSV extends ContentType(".csv")
  case object Parquet extends ContentType(".parquet")
  case object JSON extends ContentType(".json")
  case object JSONZ extends ContentType(".json.gz")
  case object HDF5 extends ContentType(".h5")
  /** Spark-native columnar extension BEYOND the reference's factory
    * (EtlFactory.cs enumerates only the five above) — kept out of
    * [[all]] so the declared parity set stays the reference's. */
  case object ORC extends ContentType(".orc")

  val all: Seq[ContentType] = Seq(CSV, Parquet, JSON, JSONZ, HDF5)
}

object Etl {

  /** ETL-visible schema (graft.core.VectorSchema.etlSchema equivalent). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("values", ArrayType(FloatType)),
    StructField("tags", ArrayType(ShortType)),
    StructField("original_text", StringType)))

  private val jsonSchema: StructType = StructType(Seq(
    StructField("I", StringType),
    StructField("V", ArrayType(FloatType)),
    StructField("T", ArrayType(ShortType)),
    StructField("O", StringType)))

  private def requireEtlColumns(df: DataFrame): DataFrame =
    df.select(col("id").cast("string"),
      col("values").cast(ArrayType(FloatType)),
      col("tags").cast(ArrayType(ShortType)),
      col("original_text").cast("string"))

  /** Export `(id, values, tags, original_text)` to `path` in `ct` format. */
  def exportData(df: DataFrame, ct: ContentType, path: String): Unit = {
    val d = requireEtlColumns(df)
    ct match {
      case ContentType.CSV =>
        d.select(
          col("id").as("Id"),
          concat_ws(",", col("values")).as("Values"),
          concat_ws(",", col("tags")).as("Tags"),
          col("original_text").as("OriginalText"))
          .write.mode("overwrite")
          .option("header", "true").option("delimiter", ";")
          .csv(path)
      case ContentType.JSON =>
        toJsonKeys(d).write.mode("overwrite").json(path)
      case ContentType.JSONZ =>
        toJsonKeys(d).write.mode("overwrite").option("compression", "gzip").json(path)
      case ContentType.Parquet =>
        d.write.mode("overwrite").parquet(path)
      case ContentType.ORC =>
        d.write.mode("overwrite").orc(path)
      case ContentType.HDF5 =>
        throw new UnsupportedOperationException(
          "HDF5 export is declared but not implemented (parity with Neighborly/ETL/HDF5.cs:15-28)")
    }
  }

  /** Import vectors from `path` (file or directory of part files). */
  def importData(spark: SparkSession, ct: ContentType, path: String): DataFrame = ct match {
    case ContentType.CSV =>
      val raw = spark.read
        .option("header", "true").option("delimiter", ";")
        .option("ignoreLeadingWhiteSpace", "true").option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
      raw.select(
        col("Id").as("id"),
        splitArray(col("Values")).cast(ArrayType(FloatType)).as("values"),
        splitArray(col("Tags")).cast(ArrayType(ShortType)).as("tags"),
        col("OriginalText").as("original_text"))
    case ContentType.JSON =>
      fromJsonKeys(spark.read.schema(jsonSchema).json(path))
    case ContentType.JSONZ =>
      // codec inferred from the .gz part-file extension
      fromJsonKeys(spark.read.schema(jsonSchema).json(path))
    case ContentType.Parquet =>
      spark.read.schema(schema).parquet(path)
    case ContentType.ORC =>
      spark.read.schema(schema).orc(path)
    case ContentType.HDF5 =>
      throw new UnsupportedOperationException(
        "HDF5 import is declared but not implemented (parity with Neighborly/ETL/HDF5.cs:15-28)")
  }

  /** `,`-packed array field → string array, dropping blank entries
    * (the reference's ArrayConverter skips null/whitespace — Csv.cs:74-80). */
  private def splitArray(c: org.apache.spark.sql.Column) =
    filter(split(c, ","), s => trim(s) =!= "")

  private def toJsonKeys(d: DataFrame): DataFrame =
    d.select(col("id").as("I"), col("values").as("V"),
      col("tags").as("T"), col("original_text").as("O"))

  private def fromJsonKeys(d: DataFrame): DataFrame =
    d.select(col("I").as("id"), col("V").as("values"),
      col("T").as("tags"), col("O").as("original_text"))

  /** Round-trip helper used by the oracle queries: export then re-import. */
  def roundTrip(df: DataFrame, ct: ContentType, path: String): DataFrame = {
    exportData(df, ct, path)
    importData(df.sparkSession, ct, path)
  }
}
