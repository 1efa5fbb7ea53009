package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping document chunking — the retrieval/RAG prep
  * step (split long documents into embedder-sized windows with overlap
  * so no boundary sentence is lost). Build-brief extension.
  *
  * Contract (exact arithmetic, replayable by a SQL oracle): chunk
  * starts are 1, 1+stride, 1+2·stride, … with stride = size − overlap;
  * the chunk count is `1 + ceil(max(len − size, 0) / stride)`, so the
  * final chunk always reaches the end of the document (it may be
  * shorter than `size`, never empty for non-empty text; empty text
  * yields one empty chunk so every document survives into the chunked
  * frame). Offsets are 1-based characters, matching SQL `substring`.
  * The ceil-div runs as `floor(x / stride)` over exactly-representable
  * integer doubles (correctly-rounded IEEE division of exact integers
  * ≤ 2^53 cannot round an exact integer quotient away from itself), so
  * both engines compute identical counts.
  *
  * Scale shape: one narrow explode per document — no shuffle, no UDF;
  * output is O(len/stride) rows per doc. Embedding/indexing stages
  * compose downstream (chunk_text is a normal text column).
  */
object Chunking {

  /** (id, chunk_idx, chunk_off, chunk_len, chunk_text) — chunk_idx is
    * 1-based and contiguous per document. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int = 200, overlap: Int = 50): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val stride = size - overlap
    val len = length(col(textCol))
    val nChunks = (lit(1) +
      floor((greatest(len - size, lit(0)) + (stride - 1)) / lit(stride))).cast("int")
    val off = (col("col") * stride + 1)
    df.select(col(idCol), col(textCol),
        posexplode(sequence(lit(0), nChunks - 1)))
      .select(col(idCol),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        off.cast("long").as("chunk_off"),
        col(textCol).substr(off.cast("int"), lit(size)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
      .select(col(idCol), col("chunk_idx"), col("chunk_off"),
        col("chunk_len"), col("chunk_text"))
  }
}
