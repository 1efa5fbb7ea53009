package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Warc
import graft.pipeline.{CorpusSampling, Decontamination, Dedup, HtmlExtract, TextStats}

/** WARC crawl-container keys (r12 verdict Next #1): the step between a
  * real crawl and the corpus pipeline. The fixture writes REAL
  * `.warc.gz` files — gzip member per record, warcinfo + request +
  * response records, HTTP envelopes — whose response bodies are the
  * [[HtmlExtract.wrapHtml]] pages of each document and whose URL /
  * WARC-Date are deterministic functions of `(source, doc_id)`. The
  * DuckDB oracle regenerates `(url, fetch_time, html)` straight from
  * `documents`, so a framing, gzip-member, HTTP-strip or charset bug
  * anywhere in the container round-trip breaks the hash-match.
  *
  *  - `warc_read`: write → read → strip; full row identity.
  *  - `pipeline_e2e_warc`: the crawl-to-corpus story end-to-end —
  *    WARC responses → main-content extraction → quality+language gate
  *    → exact dedup → decontamination → per-source quota, all on text
  *    that crossed a real container boundary. Oracle = the e2e chain
  *    over the reconstructed pages (container round-trip is identity).
  */
object WarcQueries {

  /** Fixture response frame `(url, fetch_time, html)` derived from
    * `documents` — every column replayable in SQL. URLs carry CRAWL
    * NOISE (scheme/host case, `www.`, a tracker param, a trailing
    * slash) so the e2e chain MUST canonicalize before it can parse
    * `(source, doc_id)` back out — the real crawl→corpus order of
    * operations, and live coverage for `UrlOps` inside the chain. */
  private def fixtureFrame(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val id = col("doc_id")
    val url = concat(
      when(id % 2 === 0, lit("HTTP://")).otherwise(lit("http://")),
      when(id % 4 === 0, lit("WWW.")).otherwise(lit("")),
      when(id % 3 === 0, upper(col("source"))).otherwise(col("source")),
      lit(".example.com/doc/"), id.cast("string"),
      when(id % 6 === 0, lit("/")).otherwise(lit("")),
      when(id % 5 === 0, concat(lit("?utm_source=w"), id.cast("string")))
        .otherwise(lit("")))
    table(s, dir, "documents").select(
      url.as("url"),
      expr("timestampadd(SECOND, CAST(doc_id AS INT), TIMESTAMP'2026-01-01 00:00:00')")
        .as("fetch_time"),
      HtmlExtract.wrapHtml(col("doc_id"), col("text")).as("html"))
  }

  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Write the fixture WARC files once per dataset; returns the glob. */
  private def warcGlobFor(s: org.apache.spark.sql.SparkSession, dir: String): String =
    written.computeIfAbsent(sessionKey(s, dir), _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_warc_" +
        Integer.toHexString(dir.hashCode)
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true) // no stale parts from other layouts
      Warc.write(fixtureFrame(s, dir).repartition(4, col("url")), out)
      s"$out/*.warc.gz"
    })

  /** Image-page fixture `(url, fetch_time, html)`: pages whose blocks
    * carry `<img>` chrome in the shapes pair extraction must handle —
    * double-quoted src+alt with caption text in the img's block,
    * single-quoted alt-BEFORE-src inside `<figure>` with no caption,
    * src-only with neither. The img srcs carry crawl noise
    * (scheme/host case, a tracker param, a trailing slash) so
    * `UrlOps.canonicalize` has live coverage on the IMAGE url; page
    * urls are born canonical. */
  private def imgFixtureFrame(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val id = col("doc_id").cast("string")
    val img1 = concat(
      lit("<div class=\"img\"><img src=\"HTTP://Media.Example.com/i/"), id,
      lit(".jpg?utm_source=x&v=1\" alt=\"Alt "), id,
      lit("\"> Photo caption number "), id, lit("</div>\n"))
    val img2 = when(col("doc_id") % 3 === 0, concat(
      lit("<figure><img alt='Second "), id,
      lit("' src='http://cdn.example.com/c/"), id, lit("/'></figure>\n")))
      .otherwise(lit(""))
    val img3 = when(col("doc_id") % 4 === 0, concat(
      lit("<div><img src=\"http://pix.example.com/p/"), id, lit("\"></div>\n")))
      .otherwise(lit(""))
    val html = concat(
      lit("<html><head><title>Doc "), id, lit("</title></head><body>\n"),
      lit("<h1>Document "), id, lit("</h1>\n"),
      img1, img2, img3,
      lit("<p>"), array_join(slice(split(col("text"), " "), 1, 10), " "),
      lit("</p>\n</body></html>"))
    table(s, dir, "documents").select(
      concat(lit("http://"), col("source"), lit(".img.example.com/doc/"), id)
        .as("url"),
      expr("timestampadd(SECOND, CAST(doc_id AS INT), TIMESTAMP'2026-02-01 00:00:00')")
        .as("fetch_time"),
      html.as("html"))
  }

  private def imgWarcGlobFor(s: org.apache.spark.sql.SparkSession, dir: String): String =
    written.computeIfAbsent(sessionKey(s, dir) + "#img", _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_warcimg_" +
        Integer.toHexString(dir.hashCode)
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      Warc.write(imgFixtureFrame(s, dir).repartition(4, col("url")), out)
      s"$out/*.warc.gz"
    })

  val defs: Map[String, Q] = Map(
    // Container round-trip: the reader must skip warcinfo/request
    // members, consume gzip member-per-record framing, strip the HTTP
    // envelope and parse WARC-Date — any slip changes a row.
    "warc_read" -> ((s, dir) =>
      Warc.responses(s, warcGlobFor(s, dir))
        .select(col("url"), col("fetch_time"), col("http_status"),
          col("mime"), col("html"))),

    // Crawl → corpus end-to-end: CANONICALIZE the noisy crawl URL
    // (UrlOps — case, www., tracker, trailing slash), recover
    // (doc_id, source) from the canonical form, extract main content,
    // then the standard 4-stage chain (decontamination evals are
    // external benchmarks — they come from the RAW documents table,
    // not the crawl).
    "pipeline_e2e_warc" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val canon = graft.pipeline.UrlOps.canonicalize(col("url"))
      val extracted = Warc.responses(s, warcGlobFor(s, dir)).select(
        regexp_extract(canon, "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        regexp_extract(canon, "^http://([^.]+)\\.", 1).as("source"),
        HtmlExtract.mainContent(col("html")).as("text"))
      e2eTail(s, d, extracted)
    }),

    // Image-text pair extraction (r13 verdict Next #3): WARC responses
    // → one codegen scan per page emitting (src, alt, caption) per
    // <img> (caption = the img's block's tag-stripped text) →
    // canonicalize the image URL. Full hash-match: the oracle
    // reconstructs the pages, re-extracts src/alt/caption per img LINE
    // with regexes (the rule, not the expected rows) and replays the
    // full canonicalization chain on the noisy srcs.
    "img_pairs" -> ((s, dir) =>
      graft.pipeline.ImgText.pairs(
        Warc.responses(s, imgWarcGlobFor(s, dir)), "url", "html")),

    // The crawl chain WITH the blocklist gate in its real position —
    // between canonicalization and extraction (r13 verdict Next #1):
    // one source's canonical host is blocklisted, so every document it
    // crawled must vanish BEFORE extraction/profiling, while the
    // decontamination eval slice (external benchmarks, raw documents)
    // is untouched. Oracle = the same chained replay minus the blocked
    // source.
    "pipeline_e2e_warc_filtered" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val rules = graft.pipeline.UrlFilter.broadcastRules(s,
        hosts = Seq("src3.example.com"), terms = Seq("casino"))
      val canon = graft.pipeline.UrlOps.canonicalize(col("url"))
      val canonical = Warc.responses(s, warcGlobFor(s, dir))
        .select(canon.as("curl"), col("html"))
      val kept = graft.pipeline.UrlFilter.keep(canonical, "curl", rules)
      val extracted = kept.select(
        regexp_extract(col("curl"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        regexp_extract(col("curl"), "^http://([^.]+)\\.", 1).as("source"),
        HtmlExtract.mainContent(col("html")).as("text"))
      e2eTail(s, d, extracted)
    }))

  /** The shared 4-stage tail of the crawl e2e chains: profile → gate →
    * exact dedup → decontaminate vs the RAW eval slice → per-source
    * quota. */
  private def e2eTail(s: org.apache.spark.sql.SparkSession,
      d: org.apache.spark.sql.DataFrame,
      extracted: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val profiled = extracted
      .withColumn("quality", TextStats.qualityScore(col("text")))
      .withColumn("lang_id", TextStats.languageId(col("text")))
      .localCheckpoint(true)
    val gated = profiled.filter(col("quality") >= 0.5 && col("lang_id") === "en")
    val deduped = Dedup.exact(gated, "doc_id", "text")
    val decon = Decontamination.decontaminate(
      deduped.filter(col("doc_id") % 10 =!= 0),
      d.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", shingleSize = 3, minOverlap = 5)
    CorpusSampling.quotaSample(decon, "source", "doc_id", quota = 10,
        salt = "e2e", prefilterMargin = Some(4.0))
      .select(col("doc_id"), col("source"), col("quality"))
  }

  val oracles: Map[String, String] = Map(
    "warc_read" ->
      s"""SELECT (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'http://' END) ||
         |  (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END) ||
         |  (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END) ||
         |  '.example.com/doc/' || CAST(doc_id AS VARCHAR) ||
         |  (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
         |  (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=w' || CAST(doc_id AS VARCHAR)
         |        ELSE '' END) AS url,
         |  TIMESTAMP '2026-01-01 00:00:00' + INTERVAL (doc_id) SECOND AS fetch_time,
         |  200 AS http_status, 'text/html' AS mime,
         |  ${PipelineQueries.htmlWrapSql} AS html
         |FROM documents""".stripMargin,

    // pair-extraction replay: reconstruct the img pages, re-extract
    // src/alt/caption per img line with regexes (one img per block
    // line — the fixture shape), then replay the FULL canonicalization
    // rule chain (incl. the percent fixed point) on the noisy srcs
    "img_pairs" -> {
      val i = "CAST(doc_id AS VARCHAR)"
      val htmlSql =
        s"""'<html><head><title>Doc ' || $i || '</title></head><body>' || chr(10) ||
           | '<h1>Document ' || $i || '</h1>' || chr(10) ||
           | '<div class="img"><img src="HTTP://Media.Example.com/i/' || $i ||
           |   '.jpg?utm_source=x&v=1" alt="Alt ' || $i ||
           |   '"> Photo caption number ' || $i || '</div>' || chr(10) ||
           | (CASE WHEN doc_id % 3 = 0 THEN '<figure><img alt=''Second ' || $i ||
           |   ''' src=''http://cdn.example.com/c/' || $i || '/''></figure>' || chr(10)
           |   ELSE '' END) ||
           | (CASE WHEN doc_id % 4 = 0 THEN '<div><img src="http://pix.example.com/p/' ||
           |   $i || '"></div>' || chr(10) ELSE '' END) ||
           | '<p>' || array_to_string(list_slice(string_split(text, ' '), 1, 10), ' ') ||
           | '</p>' || chr(10) || '</body></html>'""".stripMargin
          .linesIterator.mkString(" ")
      s"""WITH RECURSIVE ipg AS (
         |  SELECT doc_id,
         |    'http://' || source || '.img.example.com/doc/' || $i AS page_url,
         |    $htmlSql AS html
         |  FROM documents),
         |ils AS (SELECT doc_id, page_url, ls, unnest(generate_series(1, len(ls))) AS ln
         |        FROM (SELECT doc_id, page_url, string_split(html, chr(10)) AS ls
         |              FROM ipg) z),
         |iln AS (SELECT doc_id, page_url, ln, ls[ln] AS line FROM ils
         |        WHERE contains(ls[ln], '<img')),
         |iattr AS (SELECT doc_id, page_url, ln,
         |    coalesce(nullif(regexp_extract(line, 'src="([^"]*)"', 1), ''),
         |             regexp_extract(line, 'src=''([^'']*)''', 1)) AS url,
         |    coalesce(nullif(regexp_extract(line, 'alt="([^"]*)"', 1), ''),
         |             nullif(regexp_extract(line, 'alt=''([^'']*)''', 1), ''), '') AS alt,
         |    trim(regexp_replace(line, '<[^>]*>', '', 'g')) AS caption
         |  FROM iln),
         |irows AS (SELECT doc_id, page_url, alt, caption, url,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ln) - 1 AS BIGINT)
         |      AS img_idx
         |  FROM iattr),
         |${UrlQueries.canonRuleCtes("i", "irows",
               Seq("doc_id", "img_idx", "page_url", "alt", "caption"))}
         |SELECT page_url, img_idx, canonical_url AS image_url, alt, caption
         |FROM icanon""".stripMargin
    },

    // identical replay to pipeline_e2e_html: the WARC container
    // round-trip is identity on the page bytes, which is the claim
    "pipeline_e2e_warc" -> PipelineQueries.e2eOracleSql(
      PipelineQueries.htmlExtractCtes +
        ",\nhsrc AS (SELECT doc_id, source, main_text AS text FROM hx),\n",
      "hsrc"),

    // the blocklist gate drops src3's canonical host before extraction:
    // same chained replay over every NON-blocked source (the decontam
    // eval slice still reads the raw documents table, all sources)
    "pipeline_e2e_warc_filtered" -> PipelineQueries.e2eOracleSql(
      PipelineQueries.htmlExtractCtes +
        ",\nhsrc AS (SELECT doc_id, source, main_text AS text FROM hx" +
        " WHERE source != 'src3'),\n",
      "hsrc"))
}
