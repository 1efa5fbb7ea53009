package graft.pipeline

import graft.SparkSpec
import graft.functions.HtmlMain
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class HtmlExtractSpec extends SparkSpec {
  import sqlImplicits._

  private def extract(html: String, minLen: Int = 20, linkRatio: Int = 3): String =
    HtmlMain.extract(UTF8String.fromString(html), minLen, linkRatio).toString

  test("keeps long low-link blocks, drops nav/sidebar/footer chrome") {
    val page =
      """<html><body>
        |<nav><a href="/">home</a> <a href="/b">blog</a> <a href="/c">contact page</a></nav>
        |<h1>Short title</h1>
        |<p>This is the actual article body with plenty of prose content.</p>
        |<div class="ads"><a href="/buy">buy now buy now buy now buy now</a></div>
        |<p>A second real paragraph that also carries enough characters.</p>
        |<footer>copyright <a href="/tos">terms of service and privacy</a></footer>
        |</body></html>""".stripMargin
    val out = extract(page)
    assert(out ===
      "This is the actual article body with plenty of prose content.\n" +
      "A second real paragraph that also carries enough characters.")
  }

  test("messy HTML: unclosed tags, uppercase tags, attributes, inline markup") {
    val page = "<DIV CLASS='x'><P>first block of sufficient length here" +
      "<p>second <b>block</b> with <i>inline</i> markup long enough to keep" +
      "<br><span>short</span>"
    val out = extract(page)
    assert(out ===
      "first block of sufficient length here\n" +
      "second block with inline markup long enough to keep")
  }

  test("script and style bodies never leak into output") {
    val page = "<p>a real paragraph long enough to be kept</p>" +
      "<script>var x = 'this is definitely long enough to pass length';</script>" +
      "<style>.c { content: 'also long enough to pass the length test'; }</style>" +
      "<p>closing paragraph long enough to be kept too</p>"
    val out = extract(page)
    assert(out === "a real paragraph long enough to be kept\n" +
      "closing paragraph long enough to be kept too")
  }

  test("link-density boundary: 3*link == len drops, 3*link < len keeps") {
    // t = 30 chars, link text = 10 chars → 3*10 == 30 → dropped
    val boundary = "<p>" + "<a href='/'>" + "x" * 10 + "</a>" + "y" * 20 + "</p>"
    assert(extract(boundary) === "")
    // 9 link chars of 30 → 27 < 30 → kept
    val under = "<p>" + "<a href='/'>" + "x" * 9 + "</a>" + "y" * 21 + "</p>"
    assert(extract(under) === ("x" * 9 + "y" * 21))
  }

  test("nested anchors and stray close tags do not corrupt link counting") {
    val page = "<p><a href='/'><a href='/2'>deep</a>still linked</a>free text here that is long</p></a>"
    // linked chars: 'deep' + 'still linked' = 16; free = 27 chars
    // t = 'deepstill linkedfree text here that is long' (43) → 48 > 43 → dropped
    assert(extract(page) === "")
    val page2 = "<p><a href='/'>tiny</a> mostly unlinked prose content of real length</p>"
    assert(extract(page2) === "tiny mostly unlinked prose content of real length")
  }

  test("wrapHtml → mainContent round-trips the paragraphs on the fixture shape") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten eleven twelve"),
      (2L, "a b"), // single short paragraph → everything dropped
      (3L, (1 to 25).map(i => s"word$i").mkString(" "))).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        HtmlExtract.mainContent(HtmlExtract.wrapHtml(col("doc_id"), col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the 2-word tail paragraph "eleven twelve" (13 chars) falls under
    // minLen 20 and is dropped — the fixture's documented loss mode
    assert(out(1L) === "one two three four five six seven eight nine ten")
    assert(out(2L) === "")
    assert(out(3L) ===
      (1 to 10).map(i => s"word$i").mkString(" ") + "\n" +
      (11 to 20).map(i => s"word$i").mkString(" ") + "\n" +
      (21 to 25).map(i => s"word$i").mkString(" "))
  }

  test("null html yields null; empty html yields empty") {
    val df = Seq((1L, Option.empty[String]), (2L, Some(""))).toDF("id", "html")
    val rows = df.select(HtmlExtract.mainContent(col("html")).as("t"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    assert(rows.toSeq === Seq(None, Some("")))
  }
}
