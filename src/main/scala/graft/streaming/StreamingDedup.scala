package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for the ingest path — the stream form of
  * `pipeline.Dedup.exact` (build-brief LLM-pipeline extension; SURVEY
  * §2.9 streaming surface). A training-data feed dedups AS IT ARRIVES so
  * duplicates never reach storage, rather than re-scanning the corpus
  * per batch.
  *
  * Two shapes, both backed by Spark's streaming state store (state lives
  * in the checkpoint, so dedup survives query restarts):
  *
  *  - `exactForever(df, idCols)`: `dropDuplicates` on the content hash —
  *    state grows with the distinct-content count, the right tool for
  *    bounded key spaces (id upserts, catalog feeds);
  *  - `exactWithin(df, eventTimeCol, horizon, idCols)`:
  *    `dropDuplicatesWithinWatermark` — duplicates are only suppressed
  *    within the watermark horizon and state is EVICTED as the watermark
  *    advances: bounded state, the 100 TB-feed shape (near-dup batch
  *    passes catch strays beyond the horizon downstream).
  *
  * The content hash is md5 of the content column (16 bytes) — identical
  * to the batch dedup's grouping key. Across micro-batches the earlier
  * batch's row wins; within one micro-batch exactly one of the duplicate
  * rows survives (which one is an execution-order detail, same as the
  * batch path's arbitrary representative before the min-id convention).
  */
object StreamingDedup {

  /** 16-byte content key, the same key the batch path groups on. */
  def contentKey(contentCol: Column): Column = md5(contentCol.cast("binary"))

  /** Unbounded-state streaming exact dedup on content. */
  def exactForever(stream: DataFrame, contentCol: String): DataFrame =
    stream.withColumn("_ck", contentKey(col(contentCol)))
      .dropDuplicates("_ck")
      .drop("_ck")

  /** Watermark-bounded streaming exact dedup: suppress duplicates that
    * arrive within `horizon` of each other; state evicts as event time
    * advances. */
  def exactWithin(stream: DataFrame, contentCol: String,
      eventTimeCol: String, horizon: String): DataFrame =
    stream.withColumn("_ck", contentKey(col(contentCol)))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("_ck")
      .drop("_ck")
}
