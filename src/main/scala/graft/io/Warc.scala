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
  * and surfaces `(url, fetch_time, http_status, mime, html, body)` —
  * the frame `UrlOps.canonicalize` → `HtmlExtract.mainContent` → the
  * e2e pipeline chain starts from (`html` for text mimes, `body` the
  * exact octets for binary media consumers).
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
      // parseStream closes `in` at EOF, but a downstream limit/take can
      // abandon the iterator mid-file — the task-completion listener
      // guarantees the file handle (and gzip Inflater) is released then
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        try in.close() catch { case _: java.io.IOException => }
      }
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
    * `(url, fetch_time, http_status, mime, html, body)`. `fetch_time`
    * parses the ISO-8601 `WARC-Date`; `html` decodes the HTTP body as
    * UTF-8 for TEXT mimes only (NULL otherwise — a binary payload must
    * not be garbled through a charset decode); `body` carries the exact
    * HTTP body octets for every response, the column image/PDF
    * consumers read. */
  def responses(spark: SparkSession, path: String): DataFrame =
    responseProjection(read(spark, path))

  private def responseProjection(records: DataFrame): DataFrame =
    records
      .filter(col("warc_type") === "response")
      .select(col("url"),
        to_timestamp(col("warc_date")).as("fetch_time"),
        HttpPayload.statusCol(col("payload")).as("http_status"),
        HttpPayload.mimeCol(col("payload")).as("mime"),
        HttpPayload.bodyCol(col("payload")).as("html"),
        HttpPayload.bodyBytesCol(col("payload")).as("body"))

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
    * of extra CR/LF between records; stops cleanly at EOF and CLOSES
    * the stream there (callers that stop early must close it
    * themselves — [[read]] registers a task-completion listener). */
  def parseStream(in: InputStream): Iterator[Record] = new Iterator[Record] {
    private var nextRec: Record = _
    private var done = false
    private def finish(): Unit = {
      done = true
      try in.close() catch { case _: java.io.IOException => }
    }
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
      if (line == null || !line.startsWith("WARC/")) { finish(); return true }
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
            if (in.read() < 0) { finish(); return true } // truncated: stop
            remaining -= 1
          } else remaining -= n
        }
        return false // skipped — caller retries on the next record
      }
      val payload = new Array[Byte](len.toInt)
      var off = 0
      while (off < payload.length) {
        val n = in.read(payload, off, payload.length - off)
        if (n < 0) { finish(); return true } // truncated record: drop it
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
    * `WARC-Date` formats the `fetch_time` INSTANT in UTC on the JVM
    * side (`DateTimeFormatter` at `ZoneOffset.UTC`), so the written
    * record states the true instant under ANY session time zone and
    * the write→[[responses]] round-trip is tz-independent.
    *
    * Commit protocol: each task writes to a tmp path outside the
    * `*.warc.gz` glob, then renames into place — a retried or
    * speculative duplicate attempt either loses the rename (and
    * discards its tmp) or replaces nothing, so readers never observe a
    * torn file. */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val rows = df.select(col("url").cast("string"),
      col("fetch_time").cast("timestamp"), col("html").cast("string"))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    rows.rdd.foreachPartition { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
        .withZone(java.time.ZoneOffset.UTC)
      val fin = new org.apache.hadoop.fs.Path(f"$dir/part-$pid%05d.warc.gz")
      val tmp = new org.apache.hadoop.fs.Path(
        f"$dir/_tmp-part-$pid%05d-attempt-${tc.taskAttemptId()}")
      val fs = fin.getFileSystem(conf.value)
      var published = false
      try {
        val out = fs.create(tmp, true)
        try {
          writeMember(out, warcinfoRecord(pid))
          var seq = 0L
          it.foreach { row =>
            val url = row.getString(0)
            val wdate = fmt.format(row.getTimestamp(1).toInstant)
            val html = row.getString(2)
            writeMember(out, requestRecord(url, wdate, seq))
            writeMember(out, responseRecord(url, wdate, html, seq))
            seq += 1
          }
        } finally out.close()
        // re-runs overwrite: drop a stale part before publishing (a
        // racing duplicate attempt may delete the winner's fresh file,
        // but then ITS complete rename lands — never a torn file)
        if (fs.exists(fin)) fs.delete(fin, false)
        published = fs.rename(tmp, fin) || {
          if (fs.exists(fin)) false // a duplicate attempt won the rename
          else throw new java.io.IOException(s"cannot publish $tmp -> $fin")
        }
      } finally if (!published) fs.delete(tmp, false)
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

  /** Per-record unique id: md5 over (type, url, date, in-partition seq)
    * — ISO 28500 §5.2 requires GLOBAL uniqueness, which a 32-bit
    * `url.hashCode` cannot provide (two distinct URLs per bucket at
    * ~77k records by birthday bound). */
  private def recordId(typ: String, url: String, wdate: String, seq: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$typ|$url|$wdate|$seq".getBytes("UTF-8"))
    s"<urn:graft:$typ:${d.map(b => f"$b%02x").mkString}>"
  }

  private def requestRecord(url: String, wdate: String, seq: Long): Array[Byte] = {
    val body = ("GET / HTTP/1.1\r\nHost: example.com\r\n\r\n").getBytes("UTF-8")
    record(Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> recordId("request", url, wdate, seq),
      "WARC-Date" -> wdate,
      "WARC-Target-URI" -> url,
      "Content-Type" -> "application/http;msgtype=request"), body)
  }

  private def responseRecord(url: String, wdate: String, html: String,
      seq: Long): Array[Byte] = {
    val htmlBytes = html.getBytes("UTF-8")
    val http = new ByteArrayOutputStream()
    http.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${htmlBytes.length}\r\n\r\n").getBytes("UTF-8"))
    http.write(htmlBytes)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordId("response", url, wdate, seq),
      "WARC-Date" -> wdate,
      "WARC-Target-URI" -> url,
      "Content-Type" -> "application/http;msgtype=response"), http.toByteArray)
  }
}

/** HTTP-message payload helpers shared by the `responses` projection —
  * plain column expressions over the binary payload (decode, split at
  * the first blank line), codegen'd by Catalyst. */
private[io] object HttpPayload {
  // ISO-8859-1 decode NEVER fails (every byte is one char 0..255) and
  // is ASCII-exact for the header section — a UTF-8 decode here would
  // throw MALFORMED_CHARACTER_CODING on any binary payload (Spark 4 is
  // strict), killing the whole scan on one image response.
  private def text(payload: org.apache.spark.sql.Column) =
    decode(payload, "ISO-8859-1")
  def statusCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce( // no match -> '' -> NULL (ANSI cast of '' would throw)
      nullif(regexp_extract(text(payload), "^HTTP/[0-9.]+ ([0-9]{3})", 1), lit(""))
        .cast("int"),
      lit(-1))
  def mimeCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(text(payload), "(?i)\r\nContent-Type:\\s*([^;\r\n]+)", 1)

  /** Mimes whose body is text the `html` column may decode as UTF-8. */
  private def isTextMime(mime: org.apache.spark.sql.Column) =
    mime.startsWith("text/") || mime.isin(
      "application/xhtml+xml", "application/json", "application/xml")

  /** UTF-8 body for TEXT responses only (r13 verdict note 4): a binary
    * payload (image/PDF) must not be garbled through a charset decode —
    * non-text mimes yield NULL here and keep their exact bytes in
    * [[bodyBytesCol]]. The text body reads via `cast(binary AS string)`
    * — a byte-preserving wrap, so valid UTF-8 reads exactly and a
    * stray malformed byte in a real crawl's text page degrades that one
    * value instead of throwing. A payload without an HTTP envelope
    * passes through whole (mime is unknowable — the legacy contract). */
  def bodyCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(text(payload).startsWith("HTTP/"),
      when(isTextMime(mimeCol(payload)), bodyBytesCol(payload).cast("string"))
        .otherwise(lit(null)))
      .otherwise(payload.cast("string"))

  /** EXACT HTTP body bytes for every response, text or binary: the
    * payload round-trips through ISO-8859-1 (a byte-preserving charset
    * — each byte is one char 0..255), the header section strips with
    * the same first-blank-line rule, and the remainder re-encodes to
    * the original octets. Pure codegen column ops, no UDF. */
  def bodyBytesCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = decode(payload, "ISO-8859-1")
    encode(
      when(t.startsWith("HTTP/"),
        regexp_replace(t, "(?s)^.*?\r\n\r\n", "")).otherwise(t),
      "ISO-8859-1")
  }
}
