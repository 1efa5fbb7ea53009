package graft.io

import java.io.ByteArrayInputStream
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {
  import sqlImplicits._

  private def record(typ: String, url: String, payload: Array[Byte],
      extraCrlf: String = "\r\n\r\n"): Array[Byte] = {
    val h = new StringBuilder
    h.append("WARC/1.0\r\n")
    h.append(s"WARC-Type: $typ\r\n")
    if (url.nonEmpty) h.append(s"WARC-Target-URI: $url\r\n")
    h.append("WARC-Date: 2026-01-02T03:04:05Z\r\n")
    h.append(s"Content-Length: ${payload.length}\r\n\r\n")
    h.toString.getBytes("UTF-8") ++ payload ++ extraCrlf.getBytes("UTF-8")
  }

  private def http(body: String): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body")
      .getBytes("UTF-8")

  test("parseStream walks records, skips extra CRLFs, drops a truncated tail") {
    val bytes = record("warcinfo", "", "software: x\r\n".getBytes("UTF-8")) ++
      "\r\n\r\n".getBytes("UTF-8") ++ // extra inter-record noise
      record("response", "http://a/1", http("<p>hello</p>")) ++
      // truncated: claims 100 bytes, delivers 3
      ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 100\r\n\r\nabc")
        .getBytes("UTF-8")
    val recs = Warc.parseStream(new ByteArrayInputStream(bytes)).toSeq
    assert(recs.map(_.headers("warc-type")) === Seq("warcinfo", "response"))
    assert(new String(recs(1).payload, "UTF-8").endsWith("<p>hello</p>"))
  }

  test("write/read round-trip: responses only, HTTP stripped, date parsed, members framed") {
    val dir = Files.createTempDirectory("warcspec").toString
    val df = Seq(
      ("http://s1.example.com/doc/1", java.sql.Timestamp.valueOf("2026-01-01 00:00:01"), "<html><body>one &amp; more</body></html>"),
      ("http://s2.example.com/doc/2", java.sql.Timestamp.valueOf("2026-01-01 00:00:02"), "<html><body>two\nlines</body></html>"))
      .toDF("url", "fetch_time", "html")
    Warc.write(df.repartition(2, col("url")), dir)
    // raw read sees 3 record types; responses strips to the 2 pages
    val all = Warc.read(spark, s"$dir/*.warc.gz")
    assert(all.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("warcinfo" -> 2L, "request" -> 2L, "response" -> 2L))
    val resp = Warc.responses(spark, s"$dir/*.warc.gz")
      .select("url", "fetch_time", "http_status", "mime", "html")
      .as[(String, java.sql.Timestamp, Int, String, String)]
      .collect().sortBy(_._1)
    assert(resp.map(_._1).toSeq ===
      Seq("http://s1.example.com/doc/1", "http://s2.example.com/doc/2"))
    assert(resp.map(_._5).toSeq ===
      Seq("<html><body>one &amp; more</body></html>", "<html><body>two\nlines</body></html>"))
    assert(resp.forall(_._3 == 200) && resp.forall(_._4 == "text/html"))
    assert(resp(0)._2 === java.sql.Timestamp.valueOf("2026-01-01 00:00:01"))
  }

  test("multi-byte UTF-8 bodies survive the byte-exact Content-Length framing") {
    val dir = Files.createTempDirectory("warcspec8").toString
    val page = "<p>naïve — €42 ✓</p>"
    val df = Seq(("http://x/1", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), page))
      .toDF("url", "fetch_time", "html")
    Warc.write(df, dir)
    val got = Warc.responses(spark, s"$dir/*.warc.gz")
      .select("html").as[String].head()
    assert(got === page)
  }

  test("streaming crawl refresh: watched WARC dir -> responses -> canonical-URL store") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("warcstream").toString
    val crawl = s"$root/crawl"; Files.createDirectories(java.nio.file.Paths.get(crawl))
    val store = s"$root/store"; val ckpt = s"$root/ckpt"
    def drop(name: String, rows: Seq[(String, String)]): Unit = {
      // author a real single-file .warc.gz shard into the watched dir
      val tmp = s"$root/stage_$name"
      val df = rows.toDF("url", "html")
        .withColumn("fetch_time", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      Warc.write(df.coalesce(1), tmp)
      val src = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".warc.gz")).head
      Files.move(src.toPath, java.nio.file.Paths.get(crawl, name))
    }
    drop("shard0.warc.gz", Seq(
      ("http://A.com/x?utm_source=s&k=1", "<p>one</p>"),
      ("http://b.com/y", "<p>two</p>")))
    val stream = Warc.readStreamResponses(spark, crawl)
    val q = graft.streaming.StreamingDedup.urlDedupKeep(
      stream.select(xxhash64(col("url")).as("rec_id"), col("url")),
      "rec_id", "url", store, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try {
      q.processAllAvailable()
      // a refresh shard: one re-crawl of page A (noise variant) + one novel
      drop("shard1.warc.gz", Seq(
        ("http://a.com/x/?k=1", "<p>one again</p>"),
        ("http://c.com/z", "<p>three</p>")))
      q.processAllAvailable()
    } finally q.stop()
    val kept = graft.streaming.StreamingDedup.readKept(spark, store)
      .select("canonical_url").as[String].collect().sorted.toSeq
    assert(kept === Seq("http://a.com/x?k=1", "http://b.com/y", "http://c.com/z"),
      s"got $kept")
  }

  test("a payload without an HTTP envelope passes through as the body") {
    val bytes = record("response", "http://a/r", "raw bytes, no HTTP".getBytes("UTF-8"))
    val dir = Files.createTempDirectory("warcraw").toString
    Files.write(java.nio.file.Paths.get(dir, "f.warc"), bytes)
    val got = Warc.responses(spark, s"$dir/*.warc")
      .select("html", "http_status").as[(String, Int)].head()
    assert(got === (("raw bytes, no HTTP", -1)))
  }
}
