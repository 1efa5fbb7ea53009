package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.UrlOps

/** URL canonicalization + URL-keyed dedup keys — see
  * [[graft.pipeline.UrlOps]]. Both FULL hash-match: the fixture URLs and
  * every normalization rule are plain string expressions both engines
  * rebuild 1:1 — the percent-normalization kernel's SQL replay iterates
  * a generated regexp_replace chain (66 case-insensitive unreserved
  * decodes, then 12 hex-uppercase rewrites) to a FIXED POINT via a
  * recursive CTE, because a decode can mint a new triplet the single
  * chain application misses (`%e%61` → `%ea` → `%EA`) — the same fixed
  * point the kernel's iterated scan computes, and the fixture plants
  * exactly that case so the gate exercises the second pass. Ids with
  * `id % 10 == 1` carry the same logical page as `id − 1` under crawl
  * noise; url_dedup must collapse each pair. */
object UrlQueries {

  val defs: Map[String, Q] = Map(
    "url_canonicalize" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), UrlOps.fixtureUrl(col("doc_id")).as("url"))
        .withColumn("canonical_url", UrlOps.canonicalize(col("url")))),

    "url_dedup" -> ((s, dir) =>
      UrlOps.urlDedupGroups(
        table(s, dir, "documents")
          .select(col("doc_id"), UrlOps.fixtureUrl(col("doc_id")).as("url")),
        "doc_id", "url")),

    // Streaming canonical-URL dedup drive (r12 verdict Next #8): two
    // micro-batches (even ids, then odd ids) through the persisted
    // URL-index store — each planted pair spans the batches, so the
    // second batch's rows must drop against the FIRST batch's stored
    // keys, not within-batch state. Full hash-match: kept = every row
    // whose canonical URL is novel, i.e. all but the planted ids.
    // URL/domain blocklist + safety filter (r13 verdict Next #1): the
    // crawl gate between canonicalization and extraction. Full
    // hash-match: the oracle replays BOTH rules (label-suffix host
    // match, exact case-folded path-segment match) with list ops over
    // the reconstructed fixture URLs — including the label-boundary
    // trap (notads.example.com survives ads.example.com) and the
    // hyphen trap (/casino-royale survives term 'casino').
    "url_filter" -> ((s, dir) =>
      graft.pipeline.UrlFilter.flags(
        table(s, dir, "documents")
          .select(col("doc_id"),
            graft.pipeline.UrlFilter.fixtureUrl(col("doc_id")).as("url")),
        "url", graft.pipeline.UrlFilter.fixtureRules(s))),

    "streaming_url_dedup_keep" -> ((s, dir) => {
      val urls = table(s, dir, "documents")
        .select(col("doc_id"), UrlOps.fixtureUrl(col("doc_id")).as("url"))
      val store = s"${System.getProperty("java.io.tmpdir")}/graft_surl_" +
        Integer.toHexString(sessionKey(s, dir).hashCode)
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(store), true)
      graft.streaming.StreamingDedup.urlDedupBatch(
        urls.filter(col("doc_id") % 2 === 0), 0L, "doc_id", "url", store)
      graft.streaming.StreamingDedup.urlDedupBatch(
        urls.filter(col("doc_id") % 2 =!= 0), 1L, "doc_id", "url", store)
      graft.streaming.StreamingDedup.readKept(s, store)
        .select(col("doc_id"), col("url"), col("canonical_url"))
    }))

  private val unreservedChars: Seq[Char] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9')) :+ '-' :+ '.' :+ '_' :+ '~'

  /** One pass of the [[graft.functions.PercentNorm]] rewrite system in
    * SQL: decode every unreserved triplet in any hex case, then
    * uppercase the hex of whatever triplets remain (first digit, then
    * second). The FIXED POINT of this chain — iterated by the `upfx`
    * recursive CTE below, because a decode can mint a new triplet
    * (`%e%61` → `%ea`) — is what the kernel computes: both strategies
    * exhaustively rewrite the same non-overlapping redexes. */
  private def pctNormSql(e: String): String = {
    val decoded = unreservedChars.foldLeft(e)((acc, c) =>
      f"regexp_replace($acc, '(?i)%%${c.toInt}%02x', '$c', 'g')")
    val upFirst = "abcdef".foldLeft(decoded)((acc, x) =>
      s"regexp_replace($acc, '%$x([0-9a-fA-F])', '%${x.toUpper}\\1', 'g')")
    "abcdef".foldLeft(upFirst)((acc, x) =>
      s"regexp_replace($acc, '%([0-9A-F])$x', '%\\1${x.toUpper}', 'g')")
  }

  /** GENERIC replay of [[graft.pipeline.UrlOps.canonicalize]] over any
    * CTE `src(cols…, url)`: generates the chain
    * `<p>c0, <p>cfx, <p>c1, <p>c2, <p>c3, <p>canon`, ending in
    * `<p>canon(cols…, url, canonical_url)`. `cols` must functionally
    * determine the row (they key the fixed-point join). The `<p>cfx`
    * member is RECURSIVE (the percent-norm fixed point) — every oracle
    * splicing this must open with `WITH RECURSIVE`. */
  private[queries] def canonRuleCtes(p: String, src: String,
      cols: Seq[String]): String = {
    val cs = cols.mkString(", ")
    s"""${p}c0 AS (
      |  SELECT $cs, url,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest0
      |  FROM $src),
      |${p}cfx AS (
      |  SELECT $cs, rest0 AS s, 0 AS lvl FROM ${p}c0
      |  UNION ALL
      |  SELECT $cs, s2, lvl + 1
      |  FROM (SELECT $cs, ${pctNormSql("s")} AS s2, s, lvl FROM ${p}cfx) z
      |  WHERE s2 <> s),
      |${p}c1 AS (
      |  SELECT $cs, url, scheme, hostport, fx.rest
      |  FROM ${p}c0 JOIN (SELECT $cs, arg_max(s, lvl) AS rest
      |                    FROM ${p}cfx GROUP BY $cs) fx USING ($cs)),
      |${p}c2 AS (
      |  SELECT $cs, url, scheme,
      |    regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)), '^www\\.', '') AS host,
      |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
      |    regexp_extract(rest, '^([^?]*)', 1) AS path0,
      |    regexp_extract(rest, '^[^?]*\\?(.*)$$', 1) AS query0
      |  FROM ${p}c1),
      |${p}c3 AS (
      |  SELECT $cs, url, scheme,
      |    host || (CASE WHEN port != '' AND NOT (scheme = 'http' AND port = '80')
      |                   AND NOT (scheme = 'https' AND port = '443')
      |             THEN ':' || port ELSE '' END) AS hostout,
      |    (CASE WHEN path0 = '' THEN '/' ELSE regexp_replace(path0, '(.)/$$', '\\1') END) AS path,
      |    coalesce(array_to_string(list_sort(list_filter(string_split(query0, '&'),
      |      p -> p != ''
      |        AND NOT starts_with(lower(regexp_extract(p, '^([^=]*)', 1)), 'utm_')
      |        AND lower(regexp_extract(p, '^([^=]*)', 1)) NOT IN ('fbclid', 'gclid'))), '&'),
      |      '') AS q
      |  FROM ${p}c2),
      |${p}canon AS (
      |  SELECT $cs, url,
      |    (CASE WHEN scheme = '' THEN url
      |     ELSE scheme || '://' || hostout || path ||
      |          (CASE WHEN q = '' THEN '' ELSE '?' || q END) END) AS canonical_url
      |  FROM ${p}c3)""".stripMargin
  }

  /** Fixture + rule replay ending in `ucanon(doc_id, url, canonical_url)`. */
  private[queries] val canonCtes =
    s"""ufx AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS base
      |  FROM documents),
      |uurl AS (
      |  SELECT doc_id,
      |    (CASE WHEN base % 3 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
      |          ELSE (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) END) ||
      |    '://' ||
      |    (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' WHEN doc_id % 4 = 1 THEN 'www.' ELSE '' END) ||
      |    (CASE WHEN doc_id % 2 = 0 THEN 'Site' ELSE 'site' END) ||
      |    CAST(base % 50 AS VARCHAR) || '.example.com' ||
      |    (CASE WHEN doc_id % 5 = 0 THEN (CASE WHEN base % 3 = 0 THEN ':443' ELSE ':80' END) ELSE '' END) ||
      |    '/p/' || CAST(base AS VARCHAR) || '/x' ||
      |    (CASE WHEN doc_id % 10 = 1 THEN '%61' ELSE 'a' END) ||
      |    (CASE WHEN doc_id % 2 = 0 THEN '%2F' ELSE '%2f' END) ||
      |    (CASE WHEN doc_id % 10 = 1 THEN '%e%61' ELSE '%EA' END) ||
      |    (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
      |    (CASE WHEN doc_id % 2 = 0
      |        THEN '?b=' || CAST(base % 3 AS VARCHAR) || '&' ||
      |             (CASE WHEN doc_id % 4 = 0 THEN 'UTM_Source=c' ELSE 'utm_source=c' END) ||
      |             CAST(doc_id AS VARCHAR) || '&a=' || CAST(base % 7 AS VARCHAR) || '&fbclid'
      |        ELSE '?a=' || CAST(base % 7 AS VARCHAR) || '&b=' || CAST(base % 3 AS VARCHAR) ||
      |             '&gclid=' || CAST(doc_id AS VARCHAR) END) ||
      |    (CASE WHEN doc_id % 7 = 0 THEN '#s' || CAST(doc_id AS VARCHAR) ELSE '' END) AS url
      |  FROM ufx),
      |${canonRuleCtes("u", "uurl", Seq("doc_id"))}""".stripMargin

  val oracles: Map[String, String] = Map(
    "url_canonicalize" ->
      s"""WITH RECURSIVE $canonCtes
         |SELECT doc_id, url, canonical_url FROM ucanon""".stripMargin,

    "url_dedup" ->
      s"""WITH RECURSIVE $canonCtes
         |SELECT canonical_url, count(*) AS copies, min(doc_id) AS doc_id
         |FROM ucanon GROUP BY canonical_url""".stripMargin,

    // blocklist replay: rebuild the fixture URL, derive the host's
    // label-suffix chain and the path's segment list, and apply the
    // same set-membership rules the kernel walks
    "url_filter" ->
      """WITH uf AS (
        |  SELECT doc_id,
        |    'http://' ||
        |    (CASE WHEN doc_id % 7 = 0 THEN 'ads.example.com'
        |          WHEN doc_id % 7 = 1 THEN 'x.ads.example.com'
        |          WHEN doc_id % 7 = 2 THEN 'notads.example.com'
        |          WHEN doc_id % 7 = 3 THEN 'site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com'
        |          WHEN doc_id % 7 = 4 THEN 'tracker.net'
        |          WHEN doc_id % 7 = 5 THEN 'a.b.tracker.net'
        |          ELSE 'shop.example.net' END) ||
        |    '/p/' || CAST(doc_id AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/casino'
        |          WHEN doc_id % 5 = 1 THEN '/casino-royale'
        |          WHEN doc_id % 5 = 2 THEN '/XXX' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '?q=' || CAST(doc_id % 3 AS VARCHAR)
        |          ELSE '' END) AS url
        |  FROM documents),
        |up AS (
        |  SELECT doc_id, url,
        |    string_split(lower(regexp_extract(url, '^[a-z]+://([^/?#:@]*)', 1)), '.') AS labels,
        |    string_split(regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1), '/') AS segs
        |  FROM uf),
        |fl AS (
        |  SELECT doc_id, url,
        |    len(list_filter(list_transform(generate_series(1, len(labels)),
        |          i -> array_to_string(list_slice(labels, CAST(i AS INT), len(labels)), '.')),
        |        s -> s IN ('ads.example.com', 'tracker.net'))) > 0 AS blocked_host,
        |    len(list_filter(segs, s -> s != '' AND lower(s) IN ('casino', 'xxx'))) > 0
        |      AS blocked_term
        |  FROM up)
        |SELECT doc_id, url, blocked_host, blocked_term,
        |  (blocked_host OR blocked_term) AS blocked
        |FROM fl""".stripMargin,

    // the two-batch drive keeps exactly the novel-canonical rows: every
    // id except the planted (id % 10 = 1) re-crawls
    "streaming_url_dedup_keep" ->
      s"""WITH RECURSIVE $canonCtes
         |SELECT doc_id, url, canonical_url FROM ucanon
         |WHERE doc_id % 10 != 1""".stripMargin)
}
