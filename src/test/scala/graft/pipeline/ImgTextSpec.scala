package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImgTextSpec extends SparkSpec {
  import sqlImplicits._

  private def pairsOf(html: String): Seq[(String, String, String)] =
    Seq(html).toDF("html")
      .select(explode(ImgText.pairsCol(col("html"))).as("p"))
      .select("p.src", "p.alt", "p.caption")
      .as[(String, String, String)].collect().toSeq

  test("caption is the img's own block's tag-stripped text; blocks without imgs emit nothing") {
    val html = """<html><body>
      |<p>no image in this paragraph</p>
      |<div><img src="http://a/1.jpg" alt="one"> A fine picture</div>
      |<figure><img src="http://a/2.jpg"><figcaption>cap two</figcaption></figure>
      |</body></html>""".stripMargin
    // figcaption is a block boundary: the figure block holding img 2 has
    // no text of its own, so its caption is ''
    assert(pairsOf(html) === Seq(
      ("http://a/1.jpg", "one", "A fine picture"),
      ("http://a/2.jpg", "", "")))
  }

  test("attribute parsing: either quote style, any order, missing alt, missing src") {
    val html = "<div><img alt='A' src='s1'> x</div>" +
      "<div><img src=\"s2\"> y</div>" +
      "<div><img alt=\"no src, contributes nothing\"> z</div>" +
      "<div><img SRC=\"s3\" ALT=\"caps\"> w</div>"
    assert(pairsOf(html) === Seq(
      ("s1", "A", "x"), ("s2", "", "y"), ("s3", "caps", "w")))
  }

  test("two imgs in one block share its caption; script/style imgs are skipped") {
    val html = "<div><img src='a'><img src='b'> shared cap</div>" +
      "<script>var s = '<img src=\"ghost\">';</script>" +
      "<div><img src='c'></div>"
    assert(pairsOf(html) === Seq(
      ("a", "", "shared cap"), ("b", "", "shared cap"), ("c", "", "")))
  }

  test("pairs() canonicalizes the image url and keys rows by page + index") {
    val pages = Seq(
      ("http://page/1", "<div><img src=\"HTTP://A.com/x/?utm_source=t\" alt=\"z\"> c</div>"))
      .toDF("url", "html")
    val got = ImgText.pairs(pages, "url", "html")
      .select("page_url", "img_idx", "image_url", "alt", "caption")
      .as[(String, Long, String, String, String)].collect().toSeq
    assert(got === Seq(("http://page/1", 0L, "http://a.com/x", "z", "c")))
  }
}
