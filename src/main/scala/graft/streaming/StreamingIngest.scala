package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming ingest hook — the Spark analog of the reference's
  * debounced background index rebuild (vectors modified → rebuild ≥5 s
  * later on a low-priority thread, Neighborly/VectorDatabase.cs:501-540,
  * indexing_explained.md). Declared in SURVEY §2.9 as an extension, not
  * reference parity.
  *
  * Each micro-batch (default cadence: the reference's 5 s) upserts into a
  * parquet vector table — last write per id wins within the batch — and
  * invokes `onBatch` so callers refresh derived index artifacts (packed
  * bits / LSH codes / PQ codebooks) exactly like the background thread.
  */
object StreamingIngest {

  /** Start ingesting a streaming frame of vector records into `tablePath`.
    * `onBatch(batchDf, batchId)` runs after each upsert (index refresh
    * hook). Caller owns the returned query's lifecycle. */
  def start(stream: DataFrame, tablePath: String, checkpoint: String,
      idCol: String = "id",
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // upsert: last occurrence per id wins inside the batch; batch rows
        // replace same-id rows already in the table
        val deduped = batch
          .withColumn("_seq", monotonically_increasing_id())
          .withColumn("_rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col(idCol)).orderBy(col("_seq").desc)))
          .filter(col("_rn") === 1).drop("_seq", "_rn")
        val existing =
          try spark.read.parquet(tablePath)
          catch { case _: Exception => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], deduped.schema) }
        val merged = existing
          .join(deduped.select(col(idCol)), Seq(idCol), "left_anti")
          .unionByName(deduped)
        // write to a fresh dir then swap in, so readers never see a partial table
        val tmp = tablePath + "_staging"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(tablePath)
        fs.delete(dst, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
        onBatch(deduped, batchId)
      }
      .start()
}
