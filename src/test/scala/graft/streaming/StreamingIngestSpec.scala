package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingIngestSpec extends SparkSpec {

  import sqlImplicits._

  case class Rec(id: String, values: Array[Float], original_text: String)

  private def bucketsOf(ids: String*): Set[Int] =
    ids.toDF("id").select(pmod(xxhash64($"id"), lit(64L)).cast("int")).collect()
      .map(_.getInt(0)).toSet

  test("micro-batch ingest upserts by id, rewrites only touched buckets, commits atomically") {
    implicit val sql = spark.sqlContext
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stream_${System.nanoTime()}"
    val table = s"$dir/table"
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val source = MemoryStream[Rec]
    var batches = 0
    // AvailableNow snapshots the end offset at start — enqueue BEFORE starting
    source.addData(Rec("a", Array(1f), "first"), Rec("b", Array(2f), "b"))
    val q = StreamingIngest.start(source.toDF(), table, s"$dir/ckpt",
      trigger = Trigger.AvailableNow(), // test form of the 5 s cadence
      onBatch = (_, _) => batches += 1)
    q.processAllAvailable(); q.awaitTermination()

    val (v1, m1) = StreamingIngest.readManifest(fs, table)
    assert(v1 === 1L && m1.keySet === bucketsOf("a", "b"))
    // snapshot the untouched bucket's physical files before the next batch
    val bBucket = bucketsOf("b").head
    val bFilesBefore = fs.listStatus(new Path(m1(bBucket)))
      .map(s => (s.getPath.toString, s.getLen, s.getModificationTime)).toSeq

    // second run: update "a" (last write wins) and insert "c"
    source.addData(Rec("a", Array(9f), "updated"), Rec("c", Array(3f), "c"))
    val q2 = StreamingIngest.start(source.toDF(), table, s"$dir/ckpt",
      trigger = Trigger.AvailableNow(), onBatch = (_, _) => batches += 1)
    q2.processAllAvailable(); q2.awaitTermination()

    val rows = StreamingIngest.readTable(spark, table).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("original_text")).toMap
    assert(rows === Map("a" -> "updated", "b" -> "b", "c" -> "c"))
    assert(batches >= 2)

    val (v2, m2) = StreamingIngest.readManifest(fs, table)
    assert(v2 === 2L)
    val touched = bucketsOf("a", "c")
    // untouched buckets keep their exact data dirs; files byte-identical
    m1.keySet.diff(touched).foreach { b => assert(m2(b) === m1(b)) }
    if (!touched.contains(bBucket)) {
      val bFilesAfter = fs.listStatus(new Path(m2(bBucket)))
        .map(s => (s.getPath.toString, s.getLen, s.getModificationTime)).toSeq
      assert(bFilesAfter === bFilesBefore)
    }
    // touched buckets moved to the new batch's data dir
    touched.foreach { b => assert(m2(b).contains("data/batch1")) }
    // the previous snapshot (v1) is still fully readable — atomic commit,
    // never a delete-then-rename window
    assert(spark.read.parquet(m1.values.toSeq: _*).count() === 2L)

    // vacuum retains the latest manifest and drops superseded data dirs
    StreamingIngest.vacuum(spark, table, retainVersions = 1)
    assert(StreamingIngest.readTable(spark, table).count() === 3L)
    assert(!fs.exists(new Path(s"$table/manifest/v000000001.txt")))
  }

  test("per-micro-batch index refresh: warm-path kNN sees new rows with no manual rebuild") {
    implicit val sql = spark.sqlContext
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_refresh_${System.nanoTime()}"
    val db = new graft.api.NeighborlySpark(spark, 2)
    try {
      val source = MemoryStream[Rec]
      source.addData(
        Rec("a", Array(1f, 0f), "a"), Rec("b", Array(2f, 0f), "b"))
      val refreshed = new java.util.concurrent.atomic.AtomicLong(-1)
      val q = StreamingIngest.startWithIndexRefresh(source.toDF(), s"$dir/table",
        s"$dir/ckpt", db, trigger = Trigger.AvailableNow(),
        onRefreshed = refreshed.set)
      q.processAllAvailable(); q.awaitTermination()
      assert(refreshed.get() >= 0)
      // warm path: KDTree serves from the refit LocalAnn — no explicit
      // buildAllIndexes() was ever called by the caller
      assert(db.hasWarmIndexes)
      val hits = db.search(Array(0f, 0f), 2, SearchAlgorithm.KDTree,
        similarityThreshold = 1000).collect().map(_.getString(0)).toSeq
      assert(hits === Seq("a", "b"))

      // second batch: the refit must pick up the new row AND the upsert
      source.addData(Rec("c", Array(0.5f, 0f), "c"), Rec("a", Array(9f, 0f), "moved"))
      val q2 = StreamingIngest.startWithIndexRefresh(source.toDF(), s"$dir/table",
        s"$dir/ckpt", db, trigger = Trigger.AvailableNow())
      q2.processAllAvailable(); q2.awaitTermination()
      assert(db.hasWarmIndexes)
      val hits2 = db.search(Array(0f, 0f), 3, SearchAlgorithm.KDTree,
        similarityThreshold = 1000).collect().map(_.getString(0)).toSeq
      assert(hits2 === Seq("c", "b", "a")) // "a" moved to 9f, ranks last
      assert(db.getVector("a").get.original_text === "moved")
      // HNSW name is warm too (true graph refit in the same pass)
      val hnsw = db.search(Array(0f, 0f), 1, SearchAlgorithm.HNSW,
        similarityThreshold = 1000).collect().map(_.getString(0)).toSeq
      assert(hnsw === Seq("c"))
    } finally db.close()
  }

  private val SearchAlgorithm = graft.api.SearchAlgorithm
}
