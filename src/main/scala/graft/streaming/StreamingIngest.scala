package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import scala.util.Try

/** Structured-Streaming ingest hook — the Spark analog of the reference's
  * debounced background index rebuild (vectors modified → rebuild ≥5 s
  * later on a low-priority thread, Neighborly/VectorDatabase.cs:501-540,
  * indexing_explained.md). Declared in SURVEY §2.9 as an extension, not
  * reference parity.
  *
  * Each micro-batch (default cadence: the reference's 5 s) upserts into a
  * hash-bucketed, manifest-versioned parquet table — last write per id
  * wins within the batch — and invokes `onBatch` so callers refresh
  * derived index artifacts (packed bits / LSH codes / PQ codebooks)
  * exactly like the background thread.
  *
  * Table layout (a minimal snapshot-isolated lakehouse shape):
  * {{{
  *   tablePath/
  *     data/batch<id>/_b=<k>/part….parquet   immutable per-bucket data dirs
  *     manifest/v<NNNNNNNNN>.txt         "bucket<TAB>dataDir" lines
  * }}}
  * A batch rewrites ONLY the buckets its ids hash into (O(batch), not
  * O(table)); untouched buckets keep their existing data dirs,
  * byte-for-byte. The commit is one atomic rename of a manifest file to
  * a fresh version name — readers resolve the highest committed version,
  * so they always see a complete consistent snapshot: no
  * delete-then-rename window, and a crash mid-batch leaves the previous
  * version live (the orphaned data dir is invisible until vacuumed).
  * Single-writer, as in the reference's one background indexer.
  */
object StreamingIngest {

  /** Bucket of an id: stable hash, independent of partitioning. */
  private def bucketOf(idCol: String, numBuckets: Int) =
    pmod(xxhash64(col(idCol)), lit(numBuckets.toLong)).cast("int")

  /** Highest committed manifest: (version, bucket → data dir). */
  def readManifest(fs: FileSystem, tablePath: String): (Long, Map[Int, String]) = {
    val dir = new Path(s"$tablePath/manifest")
    if (!fs.exists(dir)) return (0L, Map.empty)
    val versions = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toLong)
    if (versions.isEmpty) return (0L, Map.empty)
    val v = versions.max
    val in = fs.open(new Path(dir, f"v$v%09d.txt"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val entries = text.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(b, p) = line.split('\t'); b.toInt -> p
    }.toMap
    (v, entries)
  }

  private def writeManifest(fs: FileSystem, tablePath: String, version: Long,
      entries: Map[Int, String]): Unit = {
    val dir = new Path(s"$tablePath/manifest")
    fs.mkdirs(dir)
    val tmp = new Path(dir, f".tmp_v$version%09d")
    val out = fs.create(tmp, true)
    try out.write(entries.toSeq.sortBy(_._1)
      .map { case (b, p) => s"$b\t$p" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // rename to a FRESH name: atomic on posix/HDFS — this is the commit
    if (!fs.rename(tmp, new Path(dir, f"v$version%09d.txt")))
      throw new java.io.IOException(s"manifest commit race at version $version (single-writer contract)")
  }

  /** Current table snapshot (highest committed version). Empty manifest →
    * empty frame with the schema unknown, so callers pass `schema` via a
    * sample frame when the table may not exist yet. */
  def readTable(spark: SparkSession, tablePath: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val (_, entries) = readManifest(fs, tablePath)
    require(entries.nonEmpty, s"no committed manifest under $tablePath")
    spark.read.parquet(entries.values.toSeq: _*)
  }

  /** Drop data dirs no longer referenced by the latest manifest and
    * manifests older than `retainVersions`. Safe for readers of the
    * retained versions; run periodically, not per batch. */
  def vacuum(spark: SparkSession, tablePath: String, retainVersions: Int = 2): Unit = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val mdir = new Path(s"$tablePath/manifest")
    if (!fs.exists(mdir)) return
    val versions = fs.listStatus(mdir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toLong).sorted
    val retained = versions.takeRight(retainVersions)
    val live: Set[String] = retained.flatMap { v =>
      val in = fs.open(new Path(mdir, f"v$v%09d.txt"))
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      text.linesIterator.filter(_.nonEmpty).map(_.split('\t')(1))
    }.toSet
    versions.dropRight(retainVersions).foreach(v => fs.delete(new Path(mdir, f"v$v%09d.txt"), false))
    val ddir = new Path(s"$tablePath/data")
    if (fs.exists(ddir)) fs.listStatus(ddir).foreach { batchDir =>
      fs.listStatus(batchDir.getPath).filter(_.getPath.getName.startsWith("_b=")).foreach { bd =>
        if (!live.contains(bd.getPath.toString) && !live.exists(_.endsWith(
          s"${batchDir.getPath.getName}/${bd.getPath.getName}")))
          fs.delete(bd.getPath, true)
      }
    }
  }

  /** Start ingesting a streaming frame of vector records into `tablePath`.
    * `onBatch(batchDf, batchId)` runs after each upsert (index refresh
    * hook). Caller owns the returned query's lifecycle. */
  def start(stream: DataFrame, tablePath: String, checkpoint: String,
      idCol: String = "id", numBuckets: Int = 64,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch, tablePath, idCol, numBuckets, batchId)
        onBatch(batch, batchId)
      }
      .start()

  /** Ingest with a per-micro-batch warm-index refresh — SURVEY §2.9's
    * `foreachBatch` refit at the reference's 5 s rebuild cadence
    * (VectorDatabase.cs:501-540): after each upsert commits, the facade
    * is re-pointed at the new table snapshot and its index artifacts
    * (BQ threshold, PQ codebooks, LocalAnn + true-HNSW graphs) are refit
    * SYNCHRONOUSLY inside the batch, so a warm-path kNN issued after the
    * batch completes sees the batch's rows — no manual `buildAllIndexes`.
    *
    * Scale note: the refit cost is bounded by the micro-batch cadence the
    * caller picks, exactly like the reference's rebuild thread; the
    * upsert itself stays O(batch) (bucket rewrite). The facade keeps its
    * always-fresh invalidation in the window between upsert and refit. */
  def startWithIndexRefresh(stream: DataFrame, tablePath: String, checkpoint: String,
      db: graft.api.NeighborlySpark, idCol: String = "id", numBuckets: Int = 64,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      onRefreshed: Long => Unit = _ => ()): StreamingQuery =
    start(stream, tablePath, checkpoint, idCol, numBuckets, trigger,
      onBatch = (_, batchId) => {
        db.replaceTable(readTable(db.spark, tablePath))
        db.buildAllIndexes()
        onRefreshed(batchId)
      })

  /** One micro-batch upsert: rewrite only the buckets the batch touches,
    * then commit a new manifest version. */
  private[streaming] def upsertBatch(batch: DataFrame, tablePath: String,
      idCol: String, numBuckets: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // last occurrence per id wins inside the batch
    val deduped = batch
      .withColumn("_seq", monotonically_increasing_id())
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("_seq").desc)))
      .filter(col("_rn") === 1).drop("_seq", "_rn")
      .withColumn("_b", bucketOf(idCol, numBuckets))
      .persist()
    try {
      val affected = deduped.select("_b").distinct().collect().map(_.getInt(0)).toSet
      if (affected.isEmpty) return
      val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val (version, entries) = readManifest(fs, tablePath)
      // existing rows of ONLY the affected buckets (path-level pruning)
      val affectedDirs = entries.filter(e => affected.contains(e._1)).values.toSeq
      val existing = if (affectedDirs.isEmpty) None
        else Some(spark.read.parquet(affectedDirs: _*)
          .join(deduped.select(col(idCol)), Seq(idCol), "left_anti")
          .withColumn("_b", bucketOf(idCol, numBuckets)))
      val merged = existing.fold(deduped)(_.unionByName(deduped))
      val dataDir = s"$tablePath/data/batch$batchId"
      merged.write.mode("overwrite").partitionBy("_b").parquet(dataDir)
      // written bucket dirs (affected buckets all have ≥1 batch row)
      val newEntries = entries ++ affected.map(b => b -> s"$dataDir/_b=$b")
      writeManifest(fs, tablePath, version + 1, newEntries)
    } finally {
      Try(deduped.unpersist())
      ()
    }
  }
}
