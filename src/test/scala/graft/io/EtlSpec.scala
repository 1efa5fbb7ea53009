package graft.io

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden round-trip tests mirroring the reference's ETLTest.cs:8-49
  * (3-vector fixture, export → import → equality), plus edge cases the
  * reference's ArrayConverter handles (blank entries, special chars). */
class EtlSpec extends SparkSpec {
  import sqlImplicits._

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_etl_spec/$name"

  private val fixture = Seq(
    ("a1b2", Array(1.5f, -2.25f, 3.125f), Array(1.toShort, 2.toShort), "plain text"),
    // delimiter chars, quotes and unicode inside the text field
    ("c3d4", Array(0.1f, 0.2f, 0.3f), Array(7.toShort), "semi;colon, comma \"quoted\" ünïcode"),
    // empty tags + empty text
    ("e5f6", Array(Float.MinPositiveValue, 1e30f, -1e-30f), Array.empty[Short], ""))

  private lazy val df = fixture.toDF("id", "values", "tags", "original_text")

  private def collectSorted(d: org.apache.spark.sql.DataFrame): Seq[(String, Seq[Float], Seq[Short], String)] =
    d.collect().map { r: Row =>
      (r.getString(0),
        Option(r.getSeq[Float](1)).map(_.toSeq).getOrElse(Seq.empty),
        Option(r.getSeq[Short](2)).map(_.toSeq).getOrElse(Seq.empty),
        Option(r.getString(3)).getOrElse(""))
    }.sortBy(_._1).toSeq

  for (ct <- Seq(ContentType.CSV, ContentType.JSON, ContentType.JSONZ, ContentType.Parquet)) {
    test(s"$ct round-trip preserves ids, float bits, tags and text") {
      val path = tmp(ct.toString.toLowerCase)
      val back = Etl.roundTrip(df, ct, path)
      val got = collectSorted(back)
      val want = fixture.map(f => (f._1, f._2.toSeq, f._3.toSeq, f._4)).sortBy(_._1)
      assert(got === want)
    }
  }

  test("JSONZ actually writes gzip part files") {
    val path = tmp("gzcheck")
    Etl.exportData(df, ContentType.JSONZ, path)
    val parts = new java.io.File(path).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.gz")))
  }

  test("CSV uses ';' field delimiter with ','-packed arrays (Csv.cs:15-24)") {
    val path = tmp("csvformat")
    Etl.exportData(df, ContentType.CSV, path)
    val lines = new java.io.File(path).listFiles().filter(_.getName.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines()).toList
    assert(lines.contains("Id;Values;Tags;OriginalText"))
    val a1 = lines.find(_.startsWith("a1b2")).get
    assert(a1.contains("1.5,-2.25,3.125"))
    assert(a1.contains("1,2"))
  }

  test("HDF5 stays declared-unsupported in both directions (HDF5.cs:15-28)") {
    intercept[UnsupportedOperationException](Etl.exportData(df, ContentType.HDF5, tmp("h5")))
    intercept[UnsupportedOperationException](Etl.importData(spark, ContentType.HDF5, tmp("h5")))
  }

  test("content-type extensions mirror the reference enum") {
    assert(ContentType.all.map(_.extension) ===
      Seq(".csv", ".parquet", ".json", ".json.gz", ".h5"))
  }
}
