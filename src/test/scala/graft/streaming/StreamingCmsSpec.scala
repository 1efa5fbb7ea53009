package graft.streaming

import graft.SparkSpec
import graft.pipeline.CmSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class CmsDoc(doc_id: Long, text: String)

class StreamingCmsSpec extends SparkSpec {
  import sqlImplicits._

  private def grid(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Int]("h"), r.getAs[Long]("bucket")) ->
      r.getAs[Long]("cnt")).toMap

  test("streamed folds equal the batch sketch of everything seen; replay is idempotent") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cms_stream").toString
    val store = s"$dir/store"; val ckpt = s"$dir/ckpt"
    val a = Seq(CmsDoc(1L, "alpha alpha beta"), CmsDoc(2L, "gamma beta"))
    val b = Seq(CmsDoc(3L, "alpha delta"), CmsDoc(4L, "beta beta gamma"))

    val source = MemoryStream[CmsDoc]
    val q = StreamingCms.maintain(source.toDF(), "text", store, ckpt,
      depth = 4, width = 32,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    source.addData(a: _*)
    q.processAllAvailable()
    source.addData(b: _*)
    q.processAllAvailable()
    q.stop()

    val all = (a ++ b).toDF()
    val want = grid(CmSketch.sketch(all, "text", 4, 32))
    assert(grid(StreamingCms.read(spark, store)) === want)

    // at-least-once replay: re-fold the LAST batch id with the same
    // data — must recompute from the same predecessor, not double-fold
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = StreamingCms.versions(fs, store).last
    StreamingCms.foldBatch(b.toDF(), last, "text", store, 4, 32)
    assert(grid(StreamingCms.read(spark, store)) === want)

    // estimates off the maintained grid keep the one-sided contract
    val est = CmSketch.freqEstimates(all, "text", 4, 32, k = 10).collect()
    assert(est.forall(r => r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n")))
  }

  test("vacuum bounds the version count without losing the folded totals") {
    val dir = java.nio.file.Files.createTempDirectory("cms_vac").toString
    val store = s"$dir/store"
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batches = (0L until 5L).map(i =>
      i -> Seq(CmsDoc(i, s"tok$i alpha")).toDF())
    batches.foreach { case (id, df) =>
      StreamingCms.foldBatch(df, id, "text", store, 4, 32, keepVersions = 2)
    }
    // a long-running stream must not accumulate one file per micro-batch
    assert(StreamingCms.versions(fs, store) === Seq(3L, 4L))
    // the surviving head still carries every batch's counts
    val all = batches.map(_._2).reduce(_ unionByName _)
    assert(grid(StreamingCms.read(spark, store)) ===
      grid(CmSketch.sketch(all, "text", 4, 32)))
    // replaying the LAST committed id is still idempotent after vacuum
    StreamingCms.foldBatch(batches.last._2, 4L, "text", store, 4, 32, keepVersions = 2)
    assert(grid(StreamingCms.read(spark, store)) ===
      grid(CmSketch.sketch(all, "text", 4, 32)))
  }
}
