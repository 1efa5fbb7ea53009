package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring removal (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499 §4):
  * every substring of length >= L that occurs at least twice anywhere in
  * the corpus (across documents or repeated within one) is cut from every
  * occurrence, and the surviving segments are reassembled in order.
  *
  * The published implementation builds one suffix array over the
  * concatenated corpus — inherently O(total chars) and single-machine.
  * The distributed re-expression tiles each document into its L-char
  * windows at EVERY offset: a substring of length >= L duplicated
  * anywhere duplicates each of its L-windows, so the union of
  * duplicated-window offsets is exactly the set of characters inside
  * duplicated runs of length >= L (maximal-match semantics, like the
  * suffix-array pass). Spans are recovered per document with a
  * gaps-and-islands window and cut with one ordered fold.
  *
  * Scale shape (the suffix-array alternative is also O(n), but
  * sequential): the window scan is one narrow explode carrying an 8-byte
  * xxhash64 per offset — never the gram text; the `count >= 2` filter
  * collapses under map-side partial aggregation to one row per DISTINCT
  * gram; the surviving duplicate-hash set is typically a tiny fraction of
  * the corpus, so AQE plans the membership join as a broadcast. The
  * island window partitions by document (no global ordering), and the
  * final reassembly is a doc-id equi-join against the untouched corpus.
  * Hash width: a 64-bit collision falsely marks one L-char window
  * duplicated — expected collisions are (windows)^2 / 2^65, i.e. a
  * handful of spurious 40-char cuts per 10^14-char corpus; acceptable
  * for a cleaning pass and the same trade every hashed-shingle stage in
  * [[Dedup]] makes.
  */
object SubstrDedup {

  /** Per-document duplicated spans, 1-based `[s, e)` character
    * intervals, merged when overlapping or adjacent. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int): DataFrame = {
    require(minLen >= 1, s"substring dedup requires minLen >= 1, got $minLen")
    val L = minLen
    // sequence(1, 0) DESCENDS (same guard as Dedup.shingles), so short
    // texts get an explicit empty offset array
    val offsets = when(length(col(textCol)) >= L,
      sequence(lit(1), length(col(textCol)) - L + 1))
      .otherwise(array().cast("array<int>"))
    val grams = docs
      .select(col(idCol), col(textCol), explode(offsets).as("i"))
      .select(col(idCol), col("i"),
        xxhash64(col(textCol).substr(col("i"), lit(L))).as("h"))
    // one row per distinct gram after map-side partial agg; >= 2 keeps
    // only duplicated windows
    val dup = grams.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("h")
    val covered = grams.join(dup, "h").select(col(idCol), col("i"))
    // gaps-and-islands per document: a window starts a new island iff it
    // begins past every previous window's end (end-exclusive e = i + L;
    // i == prevMaxEnd is adjacent and merges harmlessly)
    val w = Window.partitionBy(idCol).orderBy("i")
    val prevMaxEnd = max(col("i") + L)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val withIsland = covered
      .withColumn("ni",
        when(prevMaxEnd.isNull || col("i") > prevMaxEnd, 1).otherwise(0))
      .withColumn("island",
        sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    withIsland.groupBy(col(idCol), col("island"))
      .agg(min(col("i")).as("s"), max(col("i") + L).as("e"))
      .select(col(idCol), col("s"), col("e"))
  }

  /** The cleaning pass: every duplicated run of length >= `minLen` is
    * removed from every document; output keeps all rows with the
    * reassembled text and the removed-character count. */
  def stripDuplicatedSubstrings(docs: DataFrame, idCol: String,
      textCol: String, minLen: Int): DataFrame = {
    val spans = dupSpans(docs, idCol, textCol, minLen)
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("s"), col("e")))).as("sp"),
        sum(col("e") - col("s")).as("removed"))
    val text = col(textCol)
    // ordered fold over the disjoint sorted spans: state = (kept prefix,
    // next uncopied 1-based position); finish copies the tail
    val folded = aggregate(
      col("sp"),
      struct(lit("").as("acc"), lit(1).as("nxt")),
      (st, x) => struct(
        concat(st.getField("acc"),
          text.substr(st.getField("nxt"),
            x.getField("s") - st.getField("nxt"))).as("acc"),
        x.getField("e").as("nxt")),
      st => concat(st.getField("acc"),
        text.substr(st.getField("nxt"),
          length(text) - st.getField("nxt") + 1)))
    docs.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        when(col("sp").isNull, text).otherwise(folded).as("clean_text"),
        coalesce(col("removed"), lit(0L)).cast("long").as("n_removed"))
  }
}
