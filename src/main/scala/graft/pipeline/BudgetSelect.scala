package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget data selection: keep the best-scoring documents whose
  * cumulative token count fits a global budget — the "train on the best
  * N tokens" cut every data-curation pipeline ends with (DSIR / DoReMi
  * style selection feeds a budget, not a row count). Build-brief
  * extension.
  *
  * Semantics (exact, replayable by a SQL oracle): order documents by
  * (⌊score·1e6 + 0.5⌋ DESC, id ASC) — the integer micro-unit freeze
  * (the repo-wide 6dp freeze) IS the selection-order contract, not an
  * implementation detail: two scores within 1e-6 of each other TIE and
  * cut in id order, on both engines, so engine `ORDER BY` on raw
  * doubles can never disagree in the last ulp. Select the maximal
  * prefix whose running token sum stays ≤ `budgetTokens` (each document
  * counts its own tokens — the first document that would overflow the
  * budget stops the prefix).
  *
  * Scale shape — deliberately NOT a global corpus sort: a 100 TB corpus
  * cannot `ORDER BY score` to take a prefix. Instead:
  *  1. per-score-bucket token sums (shuffle bounded by the ≤ 1e6+1
  *     distinct micro-unit scores, not the corpus);
  *  2. running totals over that BOUNDED bucket frame (single-partition
  *     window is fine — the frame is grid-bounded by construction);
  *  3. broadcast the bucket marks back: every bucket wholly under
  *     budget keeps all its docs via a NARROW filter; only the ONE
  *     boundary bucket straddling the budget needs per-doc order — a
  *     window partitioned by that single score value, shuffling one
  *     bucket, never the corpus.
  */
object BudgetSelect {

  /** Selected rows as (id, score, tokens) — the maximal
    * (score DESC, id ASC) prefix with running token sum ≤ budget. */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: String,
      tokenCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    val base = df.select(col(idCol), col(scoreCol), col(tokenCol),
      floor(col(scoreCol).cast("double") * 1e6 + 0.5).cast("long").as("si"))
    val buckets = base.groupBy("si")
      .agg(sum(col(tokenCol).cast("long")).as("btok"))
    // bounded frame: running total through each bucket in score-desc
    // order, and the total before it (prev = cum - btok)
    // materialize the grid-bounded marks frame once: both the full-
    // bucket branch and the boundary branch broadcast it, and without
    // the cut each branch would re-run the corpus-wide bucket aggregate
    val cum = buckets
      .withColumn("cum", sum("btok").over(Window.orderBy(col("si").desc)))
      .withColumn("prev", col("cum") - col("btok"))
      .localCheckpoint(true)
    val marked = base.join(broadcast(cum), "si")
    // buckets wholly within budget: narrow filter, no per-doc order
    val full = marked.filter(col("cum") <= budgetTokens)
    // the one straddling bucket: per-doc prefix inside it, id order
    // (prev == budget still admits leading zero-token docs — their
    // running sum equals the budget exactly, like the SQL prefix)
    val boundary = marked
      .filter(col("prev") <= budgetTokens && col("cum") > budgetTokens)
      .withColumn("dcum",
        sum(col(tokenCol).cast("long")).over(
          Window.partitionBy("si").orderBy(col(idCol))))
      .filter(col("prev") + col("dcum") <= budgetTokens)
    full.select(col(idCol), col(scoreCol), col(tokenCol))
      .unionAll(boundary.select(col(idCol), col(scoreCol), col(tokenCol)))
  }
}
