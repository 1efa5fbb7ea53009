package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlFilterSpec extends SparkSpec {
  import sqlImplicits._

  private def rules(hosts: Seq[String], terms: Seq[String]) =
    UrlFilter.broadcastRules(spark, hosts, terms)

  private def flagsOf(urls: Seq[String], hosts: Seq[String],
      terms: Seq[String]): Seq[(String, Boolean, Boolean)] =
    UrlFilter.flags(urls.toDF("url"), "url", rules(hosts, terms))
      .select("url", "blocked_host", "blocked_term")
      .as[(String, Boolean, Boolean)].collect().toSeq

  test("host blocking is label-suffix matching, never substring") {
    val got = flagsOf(Seq(
      "http://ads.example.com/p",      // exact
      "http://x.y.ads.example.com/p",  // deep subdomain
      "http://notads.example.com/p",   // label-boundary trap: clean
      "http://ads.example.com.evil.io/p", // blocked host as a PREFIX: clean
      "http://ADS.EXAMPLE.COM/p",      // case-folds
      "http://ads.example.com:8080/p", // port strips
      "http://u:p@ads.example.com/p",  // userinfo strips
      "not a url"                      // no scheme -> never blocks
    ), hosts = Seq("ads.example.com"), terms = Nil)
    assert(got.map(_._2) === Seq(true, true, false, false, true, true, true, false))
    assert(got.forall(!_._3))
  }

  test("term blocking is exact case-folded path-segment matching") {
    val got = flagsOf(Seq(
      "http://a.com/casino",           // segment
      "http://a.com/casino/",          // trailing slash
      "http://a.com/p/CASINO/q",       // case-folds, mid-path
      "http://a.com/casino-royale",    // hyphen trap: clean
      "http://a.com/p?casino=1",       // query is NOT a path segment
      "http://a.com/p#casino",         // fragment is NOT a path segment
      "http://a.com/"                  // empty segments never match
    ), hosts = Nil, terms = Seq("casino"))
    assert(got.map(_._3) === Seq(true, true, true, false, false, false, false))
    assert(got.forall(!_._2))
  }

  test("blocklist notation: *.  prefix and trailing dot strip; empty rules block nothing") {
    val got = flagsOf(Seq("http://x.bad.org/p", "http://bad.org/p"),
      hosts = Seq("*.bad.org."), terms = Nil)
    assert(got.map(_._2) === Seq(true, true))
    val none = flagsOf(Seq("http://anything.at/all/casino"), Nil, Nil)
    assert(none === Seq(("http://anything.at/all/casino", false, false)))
  }

  test("keep() composes with canonicalize: the crawl-gate position") {
    val noisy = Seq(
      ("http://WWW.Ads.Example.Com/x?utm_source=t", 1L), // blocked after canon
      ("http://ok.example.com/x", 2L),
      ("http://ok.example.com/Casino/x", 3L))            // term-blocked
      .toDF("url", "id")
      .withColumn("curl", UrlOps.canonicalize(col("url")))
    val kept = UrlFilter.keep(noisy, "curl",
        rules(Seq("ads.example.com"), Seq("casino")))
      .select("id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
  }

  test("null urls flag as null and keep() drops them (three-valued filter)") {
    val df = Seq(Some("http://a.com/x"), None).toDF("url")
    val r = rules(Seq("b.com"), Nil)
    val flags = UrlFilter.flags(df, "url", r)
      .select("blocked").collect().map(x => if (x.isNullAt(0)) null else x.getBoolean(0))
    assert(flags.toSeq === Seq(false, null))
    assert(UrlFilter.keep(df, "url", r).count() === 1L)
  }

  test("the fixture's flags match a direct replay of its construction rules") {
    val ids = (0L until 140L).toDF("doc_id")
    val got = UrlFilter.flags(
        ids.select(col("doc_id"), UrlFilter.fixtureUrl(col("doc_id")).as("url")),
        "url", UrlFilter.fixtureRules(spark))
      .select("doc_id", "blocked_host", "blocked_term")
      .as[(Long, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
    got.foreach { case (id, bh, bt) =>
      assert(bh === Set(0L, 1L, 4L, 5L).contains(id % 7), s"host flag at $id")
      assert(bt === Set(0L, 2L).contains(id % 5), s"term flag at $id")
    }
  }
}
