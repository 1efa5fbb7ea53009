package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{UrlBlockedHostExpr, UrlBlockedTermExpr}

/** URL/domain blocklist + safety filtering — the FIRST gate every real
  * crawl pipeline applies right after WARC ingest and canonicalization
  * (CCNet, C4 and RefinedWeb all drop documents whose host matches an
  * adult/malware/spam domain list before any content pass; C4 adds the
  * bad-word filter). Consumes exactly the key [[UrlOps.canonicalize]]
  * produces.
  *
  * Two rules:
  *
  *  1. '''host suffix block''' — a URL is blocked when its host, or any
  *     LABEL suffix of its host, is in the blocklist: `ads.example.com`
  *     blocks itself and `x.ads.example.com`, but NOT
  *     `notads.example.com` (label boundaries, never substring match —
  *     public domain blocklists are suffix lists);
  *  2. '''path-segment term block''' — a URL is blocked when any `/`
  *     path segment case-folds to a blocked term: `/casino/p1` blocks
  *     on term `casino`, `/casino-royale` does not (exact segment,
  *     not substring — the conservative C4-style reading).
  *
  * '''Scale shape.''' The rule set is driver-small (public blocklists
  * are 10⁴–10⁶ hosts — megabytes) and the corpus is petabytes, so
  * anything that shuffles or joins the corpus is wrong by construction.
  * The rules ship ONCE per executor as a [[Broadcast]] and each row is
  * flagged by a codegen [[graft.functions.UrlBlockedHostExpr]] — an
  * O(labels) hash-set walk inside the scan's Project, zero shuffle,
  * zero join, same narrow-pass discipline as the LangId scorer. (An
  * exploded-suffix equi-join against a broadcast host table computes
  * the same set but pays an explode and a per-URL aggregation; the
  * broadcast-set expression is strictly better at every scale.)
  */
object UrlFilter {

  /** Broadcast the normalized rule set once per session. Hosts and
    * terms case-fold here; a trailing `.` or leading `*.` on a host
    * entry is tolerated and stripped (common blocklist notation). */
  def broadcastRules(spark: SparkSession, hosts: Iterable[String],
      terms: Iterable[String]): Broadcast[UrlFilterRules] = {
    val h = hosts.iterator.map(_.trim.toLowerCase)
      .map(s => s.stripPrefix("*.").stripSuffix("."))
      .filter(_.nonEmpty).toSet
    val t = terms.iterator.map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
    spark.sparkContext.broadcast(UrlFilterRules(h, t))
  }

  /** Per-row block flags: `blocked_host`, `blocked_term`, `blocked` —
    * one narrow codegen Project over the scan. */
  def flags(urls: DataFrame, urlCol: String,
      rules: Broadcast[UrlFilterRules]): DataFrame =
    urls
      .withColumn("blocked_host", UrlBlockedHostExpr(col(urlCol), rules))
      .withColumn("blocked_term", UrlBlockedTermExpr(col(urlCol), rules))
      .withColumn("blocked", col("blocked_host") || col("blocked_term"))

  /** The keep gate: rows whose URL trips neither rule — the form the
    * e2e crawl chain composes between canonicalize and extraction. */
  def keep(urls: DataFrame, urlCol: String,
      rules: Broadcast[UrlFilterRules]): DataFrame =
    urls.filter(!UrlBlockedHostExpr(col(urlCol), rules) &&
      !UrlBlockedTermExpr(col(urlCol), rules))

  // ---------------------------------------------------------- fixture

  /** Deterministic blocklist-fixture URL for a document id: hosts cycle
    * through exact-blocked / subdomain-of-blocked / label-boundary-trap
    * / clean shapes, paths through blocked-term / hyphen-trap /
    * case-folded-term / clean segments — every branch a plain CASE both
    * engines rebuild. */
  def fixtureUrl(id: Column): Column = {
    val host = when(id % 7 === 0, lit("ads.example.com"))
      .when(id % 7 === 1, lit("x.ads.example.com"))
      .when(id % 7 === 2, lit("notads.example.com"))
      .when(id % 7 === 3, concat(lit("site"), (id % 50).cast("string"),
        lit(".example.com")))
      .when(id % 7 === 4, lit("tracker.net"))
      .when(id % 7 === 5, lit("a.b.tracker.net"))
      .otherwise(lit("shop.example.net"))
    val pathTail = when(id % 5 === 0, lit("/casino"))
      .when(id % 5 === 1, lit("/casino-royale"))
      .when(id % 5 === 2, lit("/XXX"))
      .otherwise(lit(""))
    val query = when(id % 2 === 0, concat(lit("?q="), (id % 3).cast("string")))
      .otherwise(lit(""))
    concat(lit("http://"), host, lit("/p/"), id.cast("string"), pathTail, query)
  }

  /** The fixture's rule set (matches the oracle's literal lists). */
  def fixtureRules(spark: SparkSession): Broadcast[UrlFilterRules] =
    broadcastRules(spark,
      hosts = Seq("ads.example.com", "tracker.net"),
      terms = Seq("casino", "xxx"))
}

/** Normalized blocklist rule set — lowercase host suffixes + lowercase
  * path-segment terms. Shipped once per executor via broadcast. */
final case class UrlFilterRules(hosts: Set[String], terms: Set[String])

/** The per-row matching kernel — static, allocation-light, shared by
  * interpreted eval and codegen. */
object UrlFilterKernel {

  /** Host of `url` (lowercased, port/userinfo stripped); empty when the
    * string has no `scheme://` shape (such rows never block). */
  private def hostOf(url: String): String = {
    val ss = url.indexOf("://")
    if (ss < 0) return ""
    var i = ss + 3
    val n = url.length
    var end = i
    while (end < n && url.charAt(end) != '/' && url.charAt(end) != '?' &&
      url.charAt(end) != '#') end += 1
    val at = url.lastIndexOf('@', end - 1)
    if (at >= i) i = at + 1
    var hostEnd = end
    val colon = url.indexOf(':', i)
    if (colon >= 0 && colon < end) hostEnd = colon
    if (hostEnd <= i) "" else url.substring(i, hostEnd).toLowerCase
  }

  /** True when the host or any of its label suffixes is blocked —
    * O(labels) hash lookups. */
  def hostBlocked(url: String, rules: UrlFilterRules): Boolean = {
    if (rules.hosts.isEmpty) return false
    var h = hostOf(url)
    while (h.nonEmpty) {
      if (rules.hosts.contains(h)) return true
      val dot = h.indexOf('.')
      if (dot < 0) return false
      h = h.substring(dot + 1)
    }
    false
  }

  /** True when any `/`-separated path segment case-folds to a blocked
    * term (exact segment match). */
  def termBlocked(url: String, rules: UrlFilterRules): Boolean = {
    if (rules.terms.isEmpty) return false
    val ss = url.indexOf("://")
    if (ss < 0) return false
    val n = url.length
    var i = ss + 3
    while (i < n && url.charAt(i) != '/' && url.charAt(i) != '?' &&
      url.charAt(i) != '#') i += 1
    // walk segments between '/' up to '?'/'#'
    while (i < n && url.charAt(i) == '/') {
      i += 1
      var j = i
      while (j < n && url.charAt(j) != '/' && url.charAt(j) != '?' &&
        url.charAt(j) != '#') j += 1
      if (j > i && rules.terms.contains(url.substring(i, j).toLowerCase))
        return true
      i = j
      if (i < n && (url.charAt(i) == '?' || url.charAt(i) == '#')) return false
    }
    false
  }
}
