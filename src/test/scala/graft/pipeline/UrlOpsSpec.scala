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

  test("percent-norm is a fixed point even when a decode mints a new triplet") {
    // /x%e%61: %61 decodes to 'a', forming the pseudo-triplet %ea that
    // the FIRST scan never saw — the iterated kernel must uppercase it
    // (r13 advice, medium): stored canonical keys must equal their own
    // re-canonicalization.
    assert(canon(
      "http://example.com/x%e%61",     // decode mints %ea → %EA (2 passes)
      "http://example.com/%%36%31",    // %36%31 → %61 → a (3 passes)
      "http://example.com/%%661",      // %66 → f mints %f1 → %F1
      "http://example.com/%6%36%31"    // chains to %661 → f1
    ) === Seq(
      "http://example.com/x%EA",
      "http://example.com/a",
      "http://example.com/%F1",
      "http://example.com/f1"))
  }

  test("percent-norm fixed point property: normalize(normalize(x)) == normalize(x)") {
    // randomized adversarial strings over the alphabet that forms
    // triplets; also compare against a brute-force leftmost-single-redex
    // rewriter (the confluence witness for the oracle's chain order)
    import graft.functions.PercentNorm
    import org.apache.spark.unsafe.types.UTF8String
    def norm(s: String): String =
      PercentNorm.normalize(UTF8String.fromString(s)).toString
    def brute(s0: String): String = {
      // rewrite ONE redex at a time (leftmost): decode unreserved
      // triplet, else uppercase a kept triplet with lowercase hex
      def hexV(c: Char): Int =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10 else -1
      def unres(v: Int): Boolean =
        (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
          (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'
      var s = s0
      var changed = true
      while (changed) {
        changed = false
        var i = 0
        while (i < s.length && !changed) {
          if (s.charAt(i) == '%' && i + 2 < s.length &&
              hexV(s.charAt(i + 1)) >= 0 && hexV(s.charAt(i + 2)) >= 0) {
            val v = hexV(s.charAt(i + 1)) * 16 + hexV(s.charAt(i + 2))
            if (unres(v)) {
              s = s.substring(0, i) + v.toChar + s.substring(i + 3); changed = true
            } else {
              val up = "%" + "0123456789ABCDEF".charAt(v >> 4) +
                "0123456789ABCDEF".charAt(v & 15)
              if (s.substring(i, i + 3) != up) {
                s = s.substring(0, i) + up + s.substring(i + 3); changed = true
              }
            }
          }
          i += 1
        }
      }
      s
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "%0123456789abcdefABCDEF/x"
    (0 until 500).foreach { _ =>
      val s = (0 until 1 + rnd.nextInt(12))
        .map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      val n1 = norm(s)
      assert(norm(n1) === n1, s"not a fixed point on '$s' -> '$n1'")
      assert(n1 === brute(s), s"diverges from single-redex rewriting on '$s'")
    }
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
