package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StatefulSpec extends SparkSpec {
  import Stateful._

  test("mapGroupsWithState totals accumulate across batches and restarts (checkpointed state)") {
    implicit val sql = spark.sqlContext
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_stateful_${System.nanoTime()}"
    val source = MemoryStream[UserEvent]
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Double)]()

    def run(): Unit = {
      // foreachBatch sink supports checkpoint recovery (memory sink doesn't)
      val q = runningTotals(source.toDS())
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserTotals], _: Long) =>
          batch.collect().foreach(t => seen.put(t.user_id, (t.n, t.sum)))
        }
        .start()
      q.processAllAvailable(); q.awaitTermination()
    }

    source.addData(UserEvent(1, 2.0), UserEvent(1, 3.0), UserEvent(2, 10.0))
    run()
    assert(seen.get(1L) === ((2L, 5.0)))
    assert(seen.get(2L) === ((1L, 10.0)))

    // restart the query: state must come back from the checkpoint
    source.addData(UserEvent(1, 5.0), UserEvent(3, 1.0))
    run()
    assert(seen.get(1L) === ((3L, 10.0))) // carried 2 events + 5.0 across restart
    assert(seen.get(3L) === ((1L, 1.0)))
    assert(seen.get(2L) === ((1L, 10.0))) // untouched in batch 2
  }
}
