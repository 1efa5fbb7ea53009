package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.CmSketch

/** Streaming count-min sketch maintenance — the stream form of
  * `pipeline.CmSketch` (build-brief LLM-pipeline extension): corpus
  * token frequencies tracked AS DATA ARRIVES, in a structure whose size
  * never grows past `depth × width` counters no matter how many
  * petabytes stream through. Mergeability by addition (the CMS
  * contract, spec-pinned in `CmSketchSpec`) is exactly what makes the
  * incremental fold correct: sketch(all data so far) = Σ per-batch
  * sketches, cell-wise.
  *
  * Each micro-batch folds its own (tiny, ≤ depth·width-row) sketch into
  * a versioned single-file parquet store with an atomic rename commit —
  * the `StreamingIngest` manifest discipline scaled down to one grid: a
  * crash mid-batch leaves the previous version live, readers always see
  * a complete snapshot. foreachBatch re-delivery overwrites the same
  * version name (batchId-keyed), so the fold is idempotent under
  * Structured Streaming's at-least-once batch replay.
  */
object StreamingCms {

  /** Committed versions (= folded batch ids), ascending. */
  def versions(fs: FileSystem, storePath: String): Seq[Long] = {
    val dir = new Path(storePath)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".parquet"))
      .map(n => n.stripPrefix("v").stripSuffix(".parquet").toLong)
      .sorted.toSeq
  }

  /** The sketch as of the highest version strictly below `beforeBatch`
    * (Long.MaxValue = latest): `(h, bucket, cnt)`, empty if none. */
  def read(spark: SparkSession, storePath: String,
      beforeBatch: Long = Long.MaxValue): DataFrame = {
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions(fs, storePath).filter(_ < beforeBatch).lastOption match {
      case Some(v) => spark.read.parquet(s"$storePath/v$v.parquet")
      case None =>
        import spark.implicits._
        Seq.empty[(Int, Long, Long)].toDF("h", "bucket", "cnt")
    }
  }

  /** Fold one micro-batch into the store: read the highest version
    * BELOW this batch id, add the batch's sketch cell-wise, commit as
    * `v<batchId>`. Versioning by batch id is what makes at-least-once
    * replay idempotent: a re-delivered batch recomputes from the SAME
    * predecessor (versions < batchId) and atomically overwrites its own
    * version — never double-folds. The grid is ≤ depth·width rows
    * end-to-end — a single-task job regardless of batch size once the
    * batch's own sketch aggregate has collapsed. */
  def foldBatch(batch: DataFrame, batchId: Long, textCol: String,
      storePath: String, depth: Int, width: Int,
      keepVersions: Int = 3): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev = read(spark, storePath, beforeBatch = batchId)
    val next = CmSketch.sketch(batch, textCol, depth, width)
      .unionByName(prev)
      .groupBy(col("h"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val tmp = new Path(s"$storePath/_tmp_b$batchId")
    next.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val target = new Path(s"$storePath/v$batchId.parquet")
    if (fs.exists(target)) fs.delete(target, true)
    fs.mkdirs(new Path(storePath))
    fs.rename(tmp, target)
    // vacuum AFTER a successful commit: without it a long-running stream
    // accumulates one file per micro-batch forever and the versions()
    // listing cost grows without bound. Keep the newest `keepVersions`
    // (the current commit + predecessors) — enough for an at-least-once
    // replay of any in-flight batch id, which always reads a version
    // strictly BELOW its own id and replayed ids are never older than
    // the last committed few. Floor of 2, not 1: under at-least-once
    // replay the failure mode is "sink committed vN, checkpoint didn't" —
    // the replay of batch N reads versions strictly BELOW N, so vN-1 must
    // survive vacuum or the replay silently refolds from an EMPTY sketch.
    val vs = versions(fs, storePath)
    vs.dropRight(math.max(keepVersions, 2)).foreach { v =>
      fs.delete(new Path(s"$storePath/v$v.parquet"), true)
    }
  }

  /** Run the maintenance query: every micro-batch folds into the store.
    * Returns the handle; callers own checkpointing/termination. */
  def maintain(stream: DataFrame, textCol: String, storePath: String,
      checkpoint: String, depth: Int = 4, width: Int = 1024,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((b: DataFrame, id: Long) =>
        foldBatch(b, id, textCol, storePath, depth, width))
      .start()
}
