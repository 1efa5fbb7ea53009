package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ImgPairsExpr

/** Image-text training-pair extraction (r13 verdict Next #3) — the
  * multimodal operator the WARC ingestion and image-dedup legs exist to
  * feed: parse `(image_url, alt, caption)` out of crawl HTML
  * (LAION/DataComp recipe — alt text and figure captions are the
  * supervision signal for image-text models), canonicalize the image
  * URL so pairs JOIN to fetched media and dedup across re-crawls.
  *
  * One narrow pass: the [[graft.functions.ImgPairs]] codegen kernel
  * scans each page once (HtmlMain's block segmentation — an img's
  * caption is its own block's tag-stripped text), `posexplode` emits a
  * row per img, and [[UrlOps.canonicalize]] runs in the same Project.
  * Zero shuffle at any corpus size.
  */
object ImgText {

  /** `(page_url, img_idx, image_url, alt, caption)` — one row per
    * `<img src=…>` in `htmlCol`, `image_url` canonicalized. */
  def pairs(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    pages
      .select(col(urlCol).as("page_url"),
        posexplode(ImgPairsExpr(col(htmlCol))))
      .select(col("page_url"), col("pos").cast("long").as("img_idx"),
        UrlOps.canonicalize(col("col.src")).as("image_url"),
        col("col.alt").as("alt"), col("col.caption").as("caption"))

  /** Raw (un-exploded) pair array for a single html column — spec and
    * composition hook. */
  def pairsCol(html: Column): Column = ImgPairsExpr(html)
}
