package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup — the first dedup key every
  * crawl-derived corpus applies (before any content pass): the same
  * logical page is crawled under scheme/host case noise, explicit
  * default ports, tracker query parameters, unstable parameter order,
  * trailing slashes and fragments. Rules are the public RFC 3986
  * syntax-based normalization plus the standard tracker-param strip:
  *
  *  1. scheme and host lowercase; a leading `www.` drops;
  *  2. explicit default ports drop (`:80` for http, `:443` for https);
  *  3. the fragment drops (never sent to the server);
  *  4. tracker params drop by their CASE-FOLDED NAME — the part before
  *     `=`, or the whole param when bare: `utm_*`, `UTM_Source=x`, a
  *     bare `fbclid`, `gclid` (r12 verdict note 2 — real crawl noise
  *     carries both case variants and valueless trackers);
  *  5. surviving query params sort bytewise (`k=v` strings — order on
  *     the wire is not identity);
  *  6. a trailing slash on a non-root path drops; an empty path
  *     canonicalizes to `/`;
  *  7. percent-encoding normalizes over path+query (RFC 3986
  *     §6.2.2.1–2): unreserved triplets decode (`%61` → `a`), every
  *     other triplet uppercases its hex (`%2f` → `%2F`) — a linear
  *     codegen kernel iterated to a FIXED POINT (a decode can mint a
  *     new triplet: `%e%61` → `%ea` → `%EA`), so canonical keys are
  *     stable under re-canonicalization
  *     ([[graft.functions.PercentNorm]]).
  *
  * Everything is plain column expressions (split / filter / array_sort /
  * regexp) plus the one narrow kernel, so Catalyst codegens the whole
  * pass — ZERO shuffle — and a DuckDB oracle replays it 1:1 with list
  * ops and a finite regexp_replace chain. Dedup on the canonical key is
  * then one aggregate (the exact-dedup shape). Host percent-encoding
  * (IRI hosts) is out of scope — hosts are lowercased as-is.
  */
object UrlOps {

  private val trackerNamePrefixes = Seq("utm_")
  private val trackerNames = Seq("fbclid", "gclid")

  /** Canonical form of `url` by the seven rules above. Null-safe; a
    * string with no `scheme://` shape canonicalizes to itself. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // percent-normalize everything after the authority (path + query) —
    // decoding can only produce unreserved chars, so it cannot create a
    // '?' or '#' and the splits below see stable boundaries
    val rest = graft.functions.PercentNormExpr(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1))
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val query0 = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)

    val host = regexp_replace(
      lower(regexp_extract(hostPort, "^([^:]*)", 1)), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val hostOut = concat(host, when(keepPort, concat(lit(":"), port)).otherwise(lit("")))

    // "(.)/$" needs a char before the slash, so the root path "/" survives
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, "(.)/$", "$1"))

    val params = filter(split(query0, "&"), p => {
      val name = lower(regexp_extract(p, "^([^=]*)", 1))
      (p =!= "" &&
        trackerNamePrefixes.map(t => !name.startsWith(t)).reduce(_ && _) &&
        trackerNames.map(t => name =!= t).reduce(_ && _))
    })
    val query = array_join(array_sort(params), "&")
    val queryOut = when(query === "", lit("")).otherwise(concat(lit("?"), query))

    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), hostOut, path, queryOut))
  }

  /** URL-keyed dedup groups: `(canonical_url, copies, <idCol>)` with the
    * minimum id as representative — one aggregate, the exact-dedup
    * shape. */
  def urlDedupGroups(df: org.apache.spark.sql.DataFrame, idCol: String,
      urlCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as(idCol))

  // ---------------------------------------------------------- fixture

  /** Deterministic crawl-URL fixture: ids with `id % 10 == 1` carry the
    * SAME logical page as `id − 1` under different crawl noise (case,
    * explicit default port, tracker params incl. upper-case and BARE
    * variants, param order, trailing slash, fragment, percent-encoding
    * case and unreserved-char encoding) — canonicalization must
    * collapse each pair. All noise keys off `id`, all identity off
    * `base`, so both engines rebuild the identical strings. */
  def fixtureUrl(id: Column): Column = {
    val base = when(id % 10 === 1, id - 1).otherwise(id)
    val https = base % 3 === 0
    val scheme = when(https, when(id % 2 === 0, lit("HTTPS")).otherwise(lit("https")))
      .otherwise(when(id % 2 === 0, lit("HTTP")).otherwise(lit("http")))
    val host = concat(
      when(id % 4 === 0, lit("WWW.")).when(id % 4 === 1, lit("www.")).otherwise(lit("")),
      when(id % 2 === 0, lit("Site")).otherwise(lit("site")),
      (base % 50).cast("string"), lit(".example.com"))
    val port = when(id % 5 === 0, when(https, lit(":443")).otherwise(lit(":80")))
      .otherwise(lit(""))
    // logical path tail is always "xa%2F": 'a' arrives encoded on the
    // planted side, the reserved %2F arrives in either hex case
    // the %e%61 side needs TWO kernel passes: pass 1 decodes %61 to 'a'
    // and mints the pseudo-triplet %ea, pass 2 uppercases it to %EA —
    // the planted coverage for percent-norm's fixed-point iteration
    val path = concat(lit("/p/"), base.cast("string"), lit("/x"),
      when(id % 10 === 1, lit("%61")).otherwise(lit("a")),
      when(id % 2 === 0, lit("%2F")).otherwise(lit("%2f")),
      when(id % 10 === 1, lit("%e%61")).otherwise(lit("%EA")),
      when(id % 6 === 0, lit("/")).otherwise(lit("")))
    val pa = concat(lit("a="), (base % 7).cast("string"))
    val pb = concat(lit("b="), (base % 3).cast("string"))
    val utm = concat(
      when(id % 4 === 0, lit("UTM_Source=c")).otherwise(lit("utm_source=c")),
      id.cast("string"))
    val query = when(id % 2 === 0,
        concat(lit("?"), pb, lit("&"), utm, lit("&"), pa, lit("&fbclid")))
      .otherwise(concat(lit("?"), pa, lit("&"), pb, lit("&gclid="), id.cast("string")))
    val frag = when(id % 7 === 0, concat(lit("#s"), id.cast("string"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }
}
