package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines — the deterministic
  * concat-and-chunk assignment of documents to fixed-length token
  * windows (the GPT-style "concatenate the shard, cut every L tokens"
  * layout; an EXTENSION beyond the reference surface like
  * [[CorpusSampling]]). Each document gets its token offset within its
  * shard's concatenation and the range of training sequences it lands
  * in; documents spanning a cut boundary report every window they touch.
  *
  * Scale shape: packing is shard-local BY DESIGN — the window runs
  * `partitionBy(shard)`, one shuffle on the shard key, sequential
  * prefix-sum within each shard. A global (un-partitioned) running sum
  * would collapse 100 TB onto a single partition — the classic window
  * scale trap — and global packing order is also not what training
  * layouts do: real corpora are tokenized and packed per shard/file, and
  * shard count is the parallelism unit. Offsets are a pure function of
  * (shard, order, token counts), so the assignment is reproducible
  * across runs and cluster sizes.
  */
object SequencePacking {

  /** Per-document packing assignment: `start_tok` (token offset of the
    * document inside its shard's concatenation), `first_seq` (the
    * seqLen-token training window its first token lands in, counted per
    * shard), and `n_seqs` (how many windows it touches; 0 for empty
    * documents). Input column order is preserved, the three assignment
    * columns append. */
  def packAssignments(df: DataFrame, shardCol: String, orderCol: String,
      tokenCol: String, seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = sum(col(tokenCol)).over(w) - col(tokenCol)
    val firstSeq = floor(col("start_tok") / lit(seqLen.toDouble))
    val lastSeq = floor((col("start_tok") + col(tokenCol) - 1) / lit(seqLen.toDouble))
    df.withColumn("start_tok", start)
      .withColumn("first_seq", firstSeq)
      .withColumn("n_seqs",
        when(col(tokenCol) === 0, lit(0L)).otherwise(lastSeq - firstSeq + 1))
  }

  /** Materialized packed-sequence rows — the layout a training loader
    * consumes: one row per (shard, training window, document span), where
    * a document crossing a cut boundary contributes one span per window
    * it touches. `seq_off` is the span's token offset inside the window,
    * `doc_off`/`span_len` the sub-range of the document's own tokens, so
    * a loader reconstructs window `s` of shard `g` by concatenating its
    * spans in `seq_off` order, and every document's spans partition
    * `[0, n_tokens)` exactly. Empty documents occupy no window and emit
    * no rows.
    *
    * Scale shape: one explode over [[packAssignments]] — each document
    * expands to `n_seqs ≈ n_tokens/seqLen + 1` rows, so output is
    * `O(corpus tokens / seqLen)` and the expansion is narrow (no shuffle
    * beyond the assignment window's shard-local one). */
  def packRows(df: DataFrame, shardCol: String, orderCol: String,
      tokenCol: String, seqLen: Int): DataFrame = {
    val L = lit(seqLen.toLong)
    packAssignments(df, shardCol, orderCol, tokenCol, seqLen)
      .filter(col(tokenCol) > 0)
      .select(col(shardCol), col(orderCol), col(tokenCol), col("start_tok"),
        explode(sequence(col("first_seq"),
          col("first_seq") + col("n_seqs") - 1)).as("seq_id"))
      .withColumn("span_begin", greatest(col("start_tok"), col("seq_id") * L))
      .withColumn("span_end",
        least(col("start_tok") + col(tokenCol), (col("seq_id") + 1) * L))
      .select(col(shardCol), col("seq_id"),
        (col("span_begin") - col("seq_id") * L).as("seq_off"),
        col(orderCol),
        (col("span_begin") - col("start_tok")).as("doc_off"),
        (col("span_end") - col("span_begin")).as("span_len"))
  }
}
