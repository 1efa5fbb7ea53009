package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ShingleHashExpr

/** Benchmark decontamination for training corpora — flag (and drop)
  * training documents that share at least `minOverlap` distinct word
  * n-grams with ANY document of an evaluation set. This is the standard
  * LLM-data hygiene pass (n-gram collision against held-out benchmarks,
  * per the published GPT-2/GPT-3-era data papers); it is an EXTENSION
  * beyond the reference surface (the reference has no corpus operators),
  * built to the same scale discipline as [[Dedup]].
  *
  * Plan shape, chosen for the 100 TB asymmetry of the problem — the
  * training corpus is huge, the eval set is benchmarks (thousands of
  * docs, not billions):
  *
  *  1. both sides reduce to (id, distinct 64-bit shingle hash) rows via
  *     the codegen [[ShingleHashExpr]] kernel — content never rides any
  *     shuffle, and hash shingles have identical distinct cardinalities
  *     to string shingles, so overlap COUNTS are identical too;
  *  2. candidates come from an equi-join on the shingle hash. The eval
  *     side is `broadcast()` by default: the train corpus is then never
  *     shuffled at all — each train partition streams once past the
  *     broadcast eval token table (map-side join), and only MATCHED
  *     (train_id, eval_id) rows enter the one aggregation shuffle,
  *     whose volume is bounded by contamination itself;
  *  3. `|∩(train, eval)|` = the per-pair match count (both sides are
  *     distinct), aggregated to a per-train-doc maximum — a train doc
  *     is contaminated iff some single eval doc overlaps it enough,
  *     which count-per-pair measures and a flat count-of-matches would
  *     not.
  *
  * A shared boilerplate shingle ("all rights reserved …") fans out as
  * |train docs containing it| × |eval docs containing it|; that product
  * is bounded by the eval side's document frequency, which is small by
  * construction for benchmark sets. For pathological eval sets set
  * `broadcastEval = false` and the same plan runs as a shuffle
  * equi-join.
  */
object Decontamination {

  /** (train idCol, max_overlap) for every train doc sharing ≥ 1 shingle
    * with some eval doc — max over eval docs of the exact distinct
    * n-gram intersection size. Zero-overlap docs emit no row (a join
    * produces no evidence for them), so downstream filters are
    * contamination-only. */
  def contaminationScores(train: DataFrame, eval0: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3,
      broadcastEval: Boolean = true): DataFrame = {
    def shingleRows(df: DataFrame, outId: String) =
      df.select(col(idCol).as(outId),
          explode(array_distinct(ShingleHashExpr(col(textCol), shingleSize))).as("_tok"))
    val trainSh = shingleRows(train, "_tid")
    val evalSh0 = shingleRows(eval0, "_eid")
    val evalSh = if (broadcastEval) broadcast(evalSh0) else evalSh0
    trainSh.join(evalSh, "_tok")
      .groupBy(col("_tid"), col("_eid"))
      .agg(count(lit(1)).as("_ov"))
      .groupBy(col("_tid"))
      .agg(max(col("_ov")).as("max_overlap"))
      .withColumnRenamed("_tid", idCol)
  }

  /** Train rows to DROP: contaminated at `minOverlap` distinct shared
    * n-grams with a single eval doc. */
  def contaminated(train: DataFrame, eval0: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3, minOverlap: Int = 5,
      broadcastEval: Boolean = true): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    contaminationScores(train, eval0, idCol, textCol, shingleSize, broadcastEval)
      .filter(col("max_overlap") >= minOverlap)
  }

  /** The decontaminated training corpus — all train columns, minus the
    * contaminated docs (an anti-join on the skinny id frame; train
    * content never rides a shuffle). */
  def decontaminate(train: DataFrame, eval0: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3, minOverlap: Int = 5,
      broadcastEval: Boolean = true): DataFrame =
    train.join(
      contaminated(train, eval0, idCol, textCol, shingleSize, minOverlap,
        broadcastEval).select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Embedding-space (semantic) decontamination: for every train vector,
    * the nearest EVAL vector by cosine distance and a contamination flag
    * at `maxDist` — catches paraphrased/near-verbatim benchmark leakage
    * that n-gram overlap misses. Same 100 TB asymmetry as the n-gram
    * path, enforced structurally: the eval set is collected to a
    * driver-bounded array (benchmarks are thousands of vectors — it
    * rides the closure exactly like IVF centroids) and the train corpus
    * is ONE narrow whole-stage-codegen pass
    * ([[graft.functions.NearestRefExpr]]) — no join, no shuffle, no
    * train-side materialization anywhere.
    *
    * Argmin ties break to the lower eval id on raw doubles (the SQL
    * `ORDER BY <raw fold>, ref_id` contract); `cos_dist` is rounded 6dp
    * for oracle-stable output AFTER the argmin.
    *
    * The eval collect is guarded by `maxEvalRows` (default 1e6 — far
    * above any benchmark suite, far below a mis-pointed train frame):
    * an eval side over the cap fails LOUDLY naming the knob instead of
    * silently OOMing the driver. */
  def semanticContamination(train: DataFrame, eval0: DataFrame, idCol: String,
      vecCol: String, maxDist: Double, maxEvalRows: Int = 1000000): DataFrame = {
    require(maxDist >= 0.0, s"maxDist must be >= 0, got $maxDist")
    val evalCount = eval0.count()
    require(evalCount <= maxEvalRows,
      s"semanticContamination eval set has $evalCount rows, over the driver-collect cap " +
        s"maxEvalRows=$maxEvalRows — the eval side must be the SMALL (benchmark) frame; " +
        s"raise maxEvalRows only if the driver can hold that many vectors")
    val refs = eval0.select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq
    val nearest = graft.functions.NearestRefExpr(col(vecCol), refs)
    train.select(col(idCol),
        nearest.getField("ref_id").as("eval_id"),
        round(nearest.getField("cos_dist"), 6).as("cos_dist"))
      .withColumn("contaminated", col("cos_dist") <= maxDist)
  }
}
