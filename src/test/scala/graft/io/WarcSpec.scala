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

  test("binary payloads survive byte-exactly in body; html is NULL for non-text mimes") {
    // a PNG-ish body with bytes that are INVALID UTF-8 (0x89, 0xff...):
    // the old UTF-8-everything decode garbled these irreversibly
    val bin = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0xff.toByte, 0x00,
      0xfe.toByte, '\r', '\n', '\r', '\n', 0x7f)
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n" +
      s"Content-Length: ${bin.length}\r\n\r\n").getBytes("UTF-8")
    val bytes = record("response", "http://a/img.png", head ++ bin) ++
      record("response", "http://a/page", http("<p>text</p>"))
    val dir = Files.createTempDirectory("warcbin").toString
    Files.write(java.nio.file.Paths.get(dir, "f.warc"), bytes)
    val got = Warc.responses(spark, s"$dir/*.warc")
      .select("url", "mime", "html", "body")
      .as[(String, String, Option[String], Array[Byte])]
      .collect().sortBy(_._1).toSeq
    assert(got.map(_._2) === Seq("image/png", "text/html"))
    assert(got(0)._3.isEmpty, "binary mime must not decode to html")
    assert(got(0)._4.toSeq === bin.toSeq, "body must be the exact octets")
    assert(got(1)._3.contains("<p>text</p>"))
    assert(new String(got(1)._4, "UTF-8") === "<p>text</p>")
  }

  test("record ids are md5-unique even for URLs with colliding hashCode") {
    // "Aa" and "BB" have equal String.hashCode — the old 32-bit id
    // scheme gave these two distinct URLs identical "unique" record ids
    val u1 = "http://x/Aa"; val u2 = "http://x/BB"
    assert(u1.hashCode === u2.hashCode)
    val dir = Files.createTempDirectory("warcids").toString
    val df = Seq(
      (u1, java.sql.Timestamp.valueOf("2026-01-01 00:00:01"), "<p>1</p>"),
      (u2, java.sql.Timestamp.valueOf("2026-01-01 00:00:01"), "<p>2</p>"))
      .toDF("url", "fetch_time", "html")
    Warc.write(df.coalesce(1), dir)
    val ids = Warc.read(spark, s"$dir/*.warc.gz")
      .select("record_id").as[String].collect().toSeq
    assert(ids.size === 5) // warcinfo + 2 requests + 2 responses
    assert(ids.distinct.size === 5, s"duplicate record ids: $ids")
  }

  test("no tmp turds remain after write; WARC-Date is UTC under any session tz") {
    val dir = Files.createTempDirectory("warctz").toString
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // 12:00 UTC instant, authored as a UTC wall-clock string
      val ts = java.sql.Timestamp.from(java.time.Instant.parse("2026-03-01T12:00:00Z"))
      Warc.write(Seq(("http://t/1", ts, "<p>t</p>"))
        .toDF("url", "fetch_time", "html").coalesce(1), dir)
      val wdate = Warc.read(spark, s"$dir/*.warc.gz")
        .filter(col("warc_type") === "response")
        .select("warc_date").as[String].head()
      assert(wdate === "2026-03-01T12:00:00Z", "must state the true UTC instant")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    // Hadoop's local FS legitimately writes hidden .crc siblings; only
    // an unpublished _tmp-* attempt file would be a torn-write leak
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("_tmp-"))
    assert(leftovers.isEmpty, s"uncommitted tmp files: ${leftovers.toSeq}")
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
