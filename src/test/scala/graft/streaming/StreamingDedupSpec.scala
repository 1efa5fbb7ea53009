package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingDedupSpec extends SparkSpec {

  case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)
  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("exactForever suppresses duplicate content across micro-batches (state checkpointed)") {
    implicit val sql = spark.sqlContext
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sdedup_${System.nanoTime()}"
    val source = MemoryStream[Doc]
    val seen = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())

    def run(): Unit = {
      val q = StreamingDedup.exactForever(source.toDF(), "text")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.add(r.getAs[Long]("doc_id")))
        }
        .start()
      q.processAllAvailable(); q.awaitTermination()
    }

    source.addData(Doc(1, "alpha", t(0)), Doc(2, "alpha", t(1)), Doc(3, "beta", t(2)))
    run()
    assert(seen.size() === 2) // first alpha + beta; duplicate alpha dropped in-batch
    // duplicate arriving in a LATER batch, after a restart: state store remembers
    source.addData(Doc(4, "alpha", t(3)), Doc(5, "gamma", t(4)))
    run()
    val ids = { val a = new java.util.ArrayList[Long](seen); a }
    assert(ids.contains(5L) && !ids.contains(4L),
      s"cross-batch duplicate must stay suppressed, got $ids")
  }

  test("exactWithin evicts state past the watermark horizon (bounded state)") {
    implicit val sql = spark.sqlContext
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sdedup_${System.nanoTime()}"
    val source = MemoryStream[Doc]
    val seen = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())

    def run(): Unit = {
      val q = StreamingDedup.exactWithin(source.toDF(), "text", "ts", "10 seconds")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.add(r.getAs[Long]("doc_id")))
        }
        .start()
      q.processAllAvailable(); q.awaitTermination()
    }

    source.addData(Doc(1, "alpha", t(0)), Doc(2, "alpha", t(5)))
    run()
    // dup within horizon dropped (which of the pair wins in-batch is an
    // execution-order detail, not part of the contract)
    assert(seen.size() === 1 && Set(1L, 2L).contains(seen.get(0)))
    // event time far past the horizon: state for "alpha" evicted, so the
    // same content is admitted again — bounded state by design
    source.addData(Doc(9, "advance", t(1000)))
    run()
    source.addData(Doc(10, "alpha", t(1001)))
    run()
    val ids = { val a = new java.util.ArrayList[Long](seen); a }
    assert(ids.contains(10L), s"content beyond the horizon must re-admit, got $ids")
  }
}
