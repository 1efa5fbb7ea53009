package graft.io

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

/** WARC (Web ARChive, ISO 28500 — the public container web crawls ship
  * in, Common-Crawl-style) reader and writer.
  *
  * '''Read scale shape.''' Real crawls arrive as tens of thousands of
  * ~1 GB `.warc.gz` files, so FILE-level parallelism is the natural
  * partitioning: one task streams one file — `binaryFiles` hands each
  * task a `PortableDataStream`, the gzip members decompress as a
  * single concatenated stream (`GZIPInputStream` consumes
  * member-per-record and whole-file compression alike), and records
  * parse incrementally off the stream. Nothing is ever materialized
  * beyond one record, so a 1 GB file costs one record's memory, and
  * 100 TB of crawl is just more files. (An RDD `flatMap` is the right
  * tool here — record framing is inherently sequential within a file,
  * exactly the per-partition imperative case.)
  *
  * '''Record framing''' (ISO 28500 §4): `WARC/1.0` version line, CRLF
  * header lines (`Name: value`), an empty line, `Content-Length`
  * payload octets, then two CRLFs. Response records carry an HTTP
  * message as payload; [[responses]] strips the HTTP header section
  * and surfaces `(url, fetch_time, http_status, mime, html)` — the
  * frame `UrlOps.canonicalize` → `HtmlExtract.mainContent` → the e2e
  * pipeline chain starts from.
  *
  * '''Write shape.''' [[write]] emits one `.warc.gz` per partition,
  * one gzip member per record (the Common Crawl layout — members can
  * be split/seeked independently by downstream tooling), via
  * `foreachPartition`: distributed, no driver materialization.
  */
object Warc {

  /** Per-record payload ceiling (256 MiB): larger records are skipped
    * on the stream, never materialized — a crawl outlier must not OOM
    * a task. */
  val MaxRecordBytes: Long = 256L << 20

  val readSchema: StructType = StructType(Seq(
    StructField("warc_file", StringType),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("url", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("payload", BinaryType)))

  // ------------------------------------------------------------- read

  /** All WARC records under `path` (glob ok; `.gz` sniffed by suffix):
    * one row per record, payload verbatim. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (file, pds) =>
      val raw = new BufferedInputStream(pds.open(), 1 << 16)
      val in = if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw
      parseStream(in).map { r =>
        Row(file, r.headers.getOrElse("warc-type", ""),
          r.headers.getOrElse("warc-record-id", ""),
          r.headers.getOrElse("warc-target-uri", ""),
          r.headers.getOrElse("warc-date", ""),
          r.headers.getOrElse("content-type", ""), r.payload)
      }
    }
    spark.createDataFrame(rows, readSchema)
  }

  /** Response records with the HTTP envelope stripped:
    * `(url, fetch_time, http_status, mime, html)`. `fetch_time` parses
    * the ISO-8601 `WARC-Date`; `html` decodes the HTTP body as UTF-8. */
  def responses(spark: SparkSession, path: String): DataFrame =
    responseProjection(read(spark, path))

  private def responseProjection(records: DataFrame): DataFrame =
    records
      .filter(col("warc_type") === "response")
      .select(col("url"),
        to_timestamp(col("warc_date")).as("fetch_time"),
        HttpPayload.statusCol(col("payload")).as("http_status"),
        HttpPayload.mimeCol(col("payload")).as("mime"),
        HttpPayload.bodyCol(col("payload")).as("html"))

  /** Parse one whole in-memory WARC file (gzip sniffed by the member
    * magic) — the per-row form the STREAMING reader uses, where Spark's
    * `binaryFile` source hands each discovered file as a row. */
  def recordsFromBytes(file: String, content: Array[Byte]): Iterator[Record] = {
    val raw = new java.io.ByteArrayInputStream(content)
    val in: InputStream =
      if (content.length >= 2 && content(0) == 0x1f.toByte && content(1) == 0x8b.toByte)
        new GZIPInputStream(raw, 1 << 16)
      else raw
    parseStream(in)
  }

  /** STREAMING WARC ingestion: watch `dir` with the `binaryFile` file
    * stream source (each newly-landed `.warc.gz` arrives exactly once,
    * offsets in the checkpoint), parse records per file, strip HTTP —
    * the same `(url, fetch_time, http_status, mime, html)` frame as the
    * batch [[responses]], as an unbounded stream. Compose with
    * [[graft.streaming.StreamingDedup.urlDedupKeep]] (canonical-URL
    * store) or the perceptual-hash legs for a full crawl-refresh ingest
    * path. One file is one task's row: per-file memory is the file's
    * bytes (crawl shards, not the corpus). */
  def readStreamResponses(spark: SparkSession, dir: String,
      pattern: String = "*.warc.gz"): DataFrame = {
    val files = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", pattern)
      .schema(new StructType()
        .add("path", StringType).add("modificationTime", TimestampType)
        .add("length", LongType).add("content", BinaryType))
      .load(dir)
    import org.apache.spark.sql.Encoders
    val records = files.select(col("path"), col("content"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (path, content) =>
        recordsFromBytes(path, content).map(r =>
          StreamedRecord(path, r.headers.getOrElse("warc-type", ""),
            r.headers.getOrElse("warc-target-uri", ""),
            r.headers.getOrElse("warc-date", ""),
            r.headers.getOrElse("content-type", ""), r.payload))
      }(Encoders.product[StreamedRecord])
      .toDF("warc_file", "warc_type", "url", "warc_date", "content_type", "payload")
    responseProjection(records)
  }

  /** One parsed record: lowercased header map + raw payload. */
  final case class Record(headers: Map[String, String], payload: Array[Byte])

  /** Row shape of the streaming reader's record frame. */
  final case class StreamedRecord(warc_file: String, warc_type: String,
      url: String, warc_date: String, content_type: String,
      payload: Array[Byte])

  /** Lazy record iterator over a (decompressed) WARC stream. Tolerant
    * of extra CR/LF between records; stops cleanly at EOF. */
  def parseStream(in: InputStream): Iterator[Record] = new Iterator[Record] {
    private var nextRec: Record = _
    private var done = false
    private def readLine(): String = {
      // header lines are ASCII; CRLF or bare LF terminated
      val b = new StringBuilder
      var c = in.read()
      while (c >= 0 && c != '\n') { if (c != '\r') b.append(c.toChar); c = in.read() }
      if (c < 0 && b.isEmpty) null else b.toString
    }
    private def advance(): Unit = {
      // iterative, not recursive: a run of oversized records must not
      // grow the stack
      while (!advanceOnce()) {}
    }
    /** One record attempt; false = skipped an oversized record, retry. */
    private def advanceOnce(): Boolean = {
      nextRec = null
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine() // inter-record CRLFs
      if (line == null || !line.startsWith("WARC/")) { done = true; return true }
      var headers = Map.empty[String, String]
      var h = readLine()
      while (h != null && h.nonEmpty) {
        val i = h.indexOf(':')
        if (i > 0) headers += (h.substring(0, i).trim.toLowerCase ->
          h.substring(i + 1).trim)
        h = readLine()
      }
      val len = headers.get("content-length").flatMap(s =>
        scala.util.Try(s.toLong).toOption).getOrElse(0L)
      if (len > MaxRecordBytes) {
        // oversized outlier (a real crawl carries the odd multi-GB
        // record): SKIP its payload on the stream and keep walking —
        // one pathological record must not OOM the task or end the file
        var remaining = len
        while (remaining > 0) {
          val n = in.skip(remaining)
          if (n <= 0) {
            if (in.read() < 0) { done = true; return true } // truncated: stop
            remaining -= 1
          } else remaining -= n
        }
        return false // skipped — caller retries on the next record
      }
      val payload = new Array[Byte](len.toInt)
      var off = 0
      while (off < payload.length) {
        val n = in.read(payload, off, payload.length - off)
        if (n < 0) { done = true; return true } // truncated record: drop it
        off += n
      }
      nextRec = Record(headers, payload)
      true
    }
    override def hasNext: Boolean = {
      if (nextRec == null && !done) advance()
      nextRec != null
    }
    override def next(): Record = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      val r = nextRec; nextRec = null; r
    }
  }

  // ------------------------------------------------------------ write

  /** Write `(url, fetch_time, html)` rows as response-record WARC:
    * one `.warc.gz` file per partition, one gzip member per record,
    * preceded by a `warcinfo` member and interleaved with `request`
    * members (the realistic Common-Crawl file shape — readers must
    * skip both). Distributed via `foreachPartition`.
    *
    * Timezone contract: `WARC-Date` renders `fetch_time` in the
    * SESSION time zone with a literal `Z` suffix — standards-correct
    * only under `spark.sql.session.timeZone=UTC` (every session in
    * this repo sets it; callers elsewhere must too, the ISO 28500
    * norm). */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val fmt = date_format(col("fetch_time"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    val rows = df.select(col("url").cast("string"), fmt.as("wdate"),
      col("html").cast("string"))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    rows.rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val path = new org.apache.hadoop.fs.Path(f"$dir/part-$pid%05d.warc.gz")
      val fs = path.getFileSystem(conf.value)
      val out = fs.create(path, true)
      try {
        writeMember(out, warcinfoRecord(pid))
        it.foreach { row =>
          val (url, wdate, html) =
            (row.getString(0), row.getString(1), row.getString(2))
          writeMember(out, requestRecord(url, wdate))
          writeMember(out, responseRecord(url, wdate, html))
        }
      } finally out.close()
    }
  }

  private def writeMember(out: OutputStream, record: Array[Byte]): Unit = {
    val gz = new GZIPOutputStream(new FilterNoClose(out))
    gz.write(record)
    gz.finish(); gz.close()
  }
  private final class FilterNoClose(out: OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def close(): Unit = flush() // member close must not close the file
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      out.write(b, off, len)
  }

  private def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    def w(s: String): Unit = b.write(s.getBytes("UTF-8"))
    w("WARC/1.0\r\n")
    headers.foreach { case (k, v) => w(s"$k: $v\r\n") }
    w(s"Content-Length: ${payload.length}\r\n\r\n")
    b.write(payload)
    w("\r\n\r\n")
    b.toByteArray
  }

  private def warcinfoRecord(pid: Int): Array[Byte] = {
    val body = "software: graft-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("UTF-8")
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:warcinfo:$pid>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"), body)
  }

  private def requestRecord(url: String, wdate: String): Array[Byte] = {
    val body = ("GET / HTTP/1.1\r\nHost: example.com\r\n\r\n").getBytes("UTF-8")
    record(Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> s"<urn:graft:request:${url.hashCode}>",
      "WARC-Date" -> wdate,
      "WARC-Target-URI" -> url,
      "Content-Type" -> "application/http;msgtype=request"), body)
  }

  private def responseRecord(url: String, wdate: String, html: String): Array[Byte] = {
    val htmlBytes = html.getBytes("UTF-8")
    val http = new ByteArrayOutputStream()
    http.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${htmlBytes.length}\r\n\r\n").getBytes("UTF-8"))
    http.write(htmlBytes)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:graft:response:${url.hashCode}>",
      "WARC-Date" -> wdate,
      "WARC-Target-URI" -> url,
      "Content-Type" -> "application/http;msgtype=response"), http.toByteArray)
  }
}

/** HTTP-message payload helpers shared by the `responses` projection —
  * plain column expressions over the binary payload (decode, split at
  * the first blank line), codegen'd by Catalyst. */
private[io] object HttpPayload {
  private def text(payload: org.apache.spark.sql.Column) =
    decode(payload, "UTF-8")
  def statusCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce( // no match -> '' -> NULL (ANSI cast of '' would throw)
      nullif(regexp_extract(text(payload), "^HTTP/[0-9.]+ ([0-9]{3})", 1), lit(""))
        .cast("int"),
      lit(-1))
  def mimeCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(text(payload), "(?i)\r\nContent-Type:\\s*([^;\r\n]+)", 1)
  def bodyCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = text(payload)
    when(t.startsWith("HTTP/"),
      regexp_replace(t, "(?s)^.*?\r\n\r\n", "")).otherwise(t)
  }
}
