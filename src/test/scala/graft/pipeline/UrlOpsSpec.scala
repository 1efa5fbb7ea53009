package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalize(col("url"))).as[String]
      .collect().toSeq

  test("RFC 3986 normalization rules, one by one") {
    assert(canon(
      "HTTP://WWW.Example.COM/Path",       // scheme+host lowercase, www strip
      "http://example.com:80/a",           // default port drops
      "https://example.com:443/a",         // default port drops (https)
      "https://example.com:8443/a",        // non-default port survives
      "http://example.com/a#frag",         // fragment drops
      "http://example.com/a/",             // trailing slash drops
      "http://example.com/",               // root path survives
      "http://example.com",                // empty path → /
      "http://example.com/a?utm_source=x&b=2&a=1", // tracker drop + sort
      "http://example.com/a?gclid=1&fbclid=2",     // all-tracker query drops
      "not a url at all"                   // no scheme → unchanged
    ) === Seq(
      "http://example.com/Path",           // path case is NOT touched
      "http://example.com/a",
      "https://example.com/a",
      "https://example.com:8443/a",
      "http://example.com/a",
      "http://example.com/a",
      "http://example.com/",
      "http://example.com/",
      "http://example.com/a?a=1&b=2",
      "http://example.com/a",
      "not a url at all"))
  }

  test("tracker strip is case-insensitive on the param NAME and catches bare params") {
    assert(canon(
      "http://example.com/a?UTM_Source=x&b=2",  // upper-case utm_ prefix
      "http://example.com/a?fbclid&b=2",        // bare fbclid, no '='
      "http://example.com/a?FBCLID=z&GCLID",    // case-folded names, bare gclid
      "http://example.com/a?fbclident=1"        // NOT a tracker (name != fbclid)
    ) === Seq(
      "http://example.com/a?b=2",
      "http://example.com/a?b=2",
      "http://example.com/a",
      "http://example.com/a?fbclident=1"))
  }

  test("percent-encoding normalizes: unreserved decodes, reserved uppercases hex") {
    assert(canon(
      "http://example.com/%7Euser/x%61",   // %7E → ~, %61 → a
      "http://example.com/a%2fb",          // reserved / stays encoded, hex uppercased
      "http://example.com/a?k=%4a%2c",     // query too: %4a → J, %2c → %2C
      "http://example.com/100%"            // bare percent is not a triplet
    ) === Seq(
      "http://example.com/~user/xa",
      "http://example.com/a%2Fb",
      "http://example.com/a?k=J%2C",
      "http://example.com/100%"))
  }

  test("the planted fixture pairs collapse; nothing else does") {
    val n = 60
    val urls = (0L until n.toLong).toDF("doc_id")
      .select(col("doc_id"), UrlOps.fixtureUrl(col("doc_id")).as("url"))
    val groups = UrlOps.urlDedupGroups(urls, "doc_id", "url").collect()
    assert(groups.length === n - n / 10) // one collapse per planted pair
    val copies = groups.map(_.getAs[Long]("copies"))
    assert(copies.count(_ == 2L) === n / 10 && copies.count(_ == 1L) === n - 2 * (n / 10))
    // raw urls of a planted pair DIFFER before canonicalization
    val raw = urls.as[(Long, String)].collect().toMap
    assert(raw(0L) !== raw(1L))
  }

  test("canonicalization is idempotent") {
    val once = canon("HTTPS://WWW.A.COM:443/x%2f%61/?UTM_Source=t&z=1&y=2&fbclid#f")
    assert(once === Seq("https://a.com/x%2Fa?y=2&z=1"))
    assert(canon(once.head) === once)
  }
}
