package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingIngestSpec extends SparkSpec {

  case class Rec(id: String, values: Array[Float], original_text: String)

  test("micro-batch ingest upserts by id and refreshes indexes per batch") {
    implicit val sql = spark.sqlContext
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stream_${System.nanoTime()}"
    val source = MemoryStream[Rec]
    var batches = 0
    // AvailableNow snapshots the end offset at start — enqueue BEFORE starting
    source.addData(Rec("a", Array(1f), "first"), Rec("b", Array(2f), "b"))
    val q = StreamingIngest.start(source.toDF(), s"$dir/table", s"$dir/ckpt",
      trigger = Trigger.AvailableNow(), // test form of the 5 s cadence
      onBatch = (_, _) => batches += 1)
    q.processAllAvailable(); q.awaitTermination()

    // second run: update "a" (last write wins) and insert "c"
    source.addData(Rec("a", Array(9f), "updated"), Rec("c", Array(3f), "c"))
    val q2 = StreamingIngest.start(source.toDF(), s"$dir/table", s"$dir/ckpt",
      trigger = Trigger.AvailableNow(), onBatch = (_, _) => batches += 1)
    q2.processAllAvailable(); q2.awaitTermination()

    val table = spark.read.parquet(s"$dir/table").collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("original_text")).toMap
    assert(table === Map("a" -> "updated", "b" -> "b", "c" -> "c"))
    assert(batches >= 2)
  }
}
