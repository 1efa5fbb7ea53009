package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.HtmlExtractExpr

/** HTML front-end for the text pipeline: main-content extraction
  * ([[graft.functions.HtmlMain]] — text-density/link-density heuristics
  * per jusText/Boilerpipe, public algorithms) plus the deterministic
  * page fixture the oracle gate runs on.
  *
  * The fixture wraps each document's text in a realistic page — nav bar,
  * `<h1>`, the text as 10-word `<p>` paragraphs, a link sidebar and a
  * link-heavy footer, one block element per line — built entirely from
  * replayable column expressions, so a DuckDB oracle reconstructs the
  * identical page AND replays the extraction rule per line. Extraction
  * itself is one narrow codegen kernel pass: zero shuffle at any scale.
  */
object HtmlExtract {

  /** Main content of an HTML page (see [[graft.functions.HtmlMain]]). */
  def mainContent(html: Column, minLen: Int = 20, linkRatio: Int = 3): Column =
    HtmlExtractExpr(html, minLen, linkRatio)

  /** Deterministic page fixture: `text` split into 10-word paragraphs
    * between boilerplate chrome. Every block on its own line (the shape
    * the SQL replay segments on). */
  def wrapHtml(id: Column, text: Column): Column = {
    val toks = split(text, " ")
    val paras = transform(
      sequence(lit(0), floor((size(toks) - 1) / lit(10)).cast("int")),
      j => concat(lit("<p>"),
        array_join(slice(toks, j * 10 + 1, lit(10)), " "), lit("</p>")))
    concat(
      lit("<html><head><title>Doc "), id.cast("string"),
      lit("</title></head><body>\n"),
      lit("<div class=\"nav\"><a href=\"/\">home</a> <a href=\"/about\">about</a> <a href=\"/contact\">contact us</a></div>\n"),
      lit("<h1>Document "), id.cast("string"), lit("</h1>\n"),
      array_join(paras, "\n"), lit("\n"),
      lit("<div class=\"side\"><a href=\"/r\">related items</a> <a href=\"/m\">more reading</a></div>\n"),
      lit("<div class=\"footer\">copyright 2026 <a href=\"/t\">terms of service</a> <a href=\"/p\">privacy policy</a></div>\n"),
      lit("</body></html>"))
  }
}
