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

  test("nearDupKeep: cross-batch near-dups drop via the persisted bucket index; novel docs survive") {
    implicit val sql = spark.sqlContext
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sneardup_${System.nanoTime()}"
    val source = MemoryStream[Doc]
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val ws = base.replace(" ", "  ") // whitespace variant: same tokens → jaccard 1.0
    val other = "completely different content about spark query engines and distributed joins at scale"

    def run(): Unit = {
      val q = StreamingDedup.nearDupKeep(
        source.toDF().select($"doc_id", $"text"), "doc_id", "text",
        s"$dir/store", s"$dir/ckpt", threshold = 0.8,
        trigger = Trigger.AvailableNow())
      q.processAllAvailable(); q.awaitTermination()
    }

    // batch 1: base + an in-batch whitespace near-dup + one novel doc
    source.addData(Doc(1, base, t(0)), Doc(2, ws, t(1)), Doc(3, other, t(2)))
    run()
    val kept1 = StreamingDedup.readKept(spark, s"$dir/store")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept1 === Seq(1L, 3L)) // 2 collapsed into 1 within the batch

    // batch 2 (restarted query, same store): a cross-batch near-dup of
    // doc 1, an exact copy of doc 3, and one genuinely new doc
    val near = base.replace("dog", "cat") // 1 token of ~17 changed → jaccard ≈ 0.84
    source.addData(Doc(10, ws, t(3)), Doc(11, other, t(4)), Doc(12, near, t(5)),
      Doc(13, "unrelated words entirely standing alone here today", t(6)))
    run()
    val kept2 = StreamingDedup.readKept(spark, s"$dir/store")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    // 10 (≡1 by tokens) and 11 (=3) must drop THROUGH THE STORE, not
    // in-batch; 12 is near but below... — check which side of 0.8 it is:
    // shingle sets of base vs near differ in 3 of ~15 3-grams → ≈ 0.67 < 0.8 → kept
    assert(kept2.contains(13L) && kept2.contains(12L),
      s"novel docs must survive, got $kept2")
    assert(!kept2.contains(10L) && !kept2.contains(11L),
      s"cross-batch near-dups must drop via the bucket index, got $kept2")
    assert(kept2 === Seq(1L, 3L, 12L, 13L))
  }

  test("nearDupKeepVectors: embedding near-dups drop across batches via the code index") {
    implicit val sql = spark.sqlContext
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_svecdup_${System.nanoTime()}"
    val rnd = new scala.util.Random(21)
    val v1 = Array.fill(64)(rnd.nextFloat())
    val v1near = v1.clone(); v1near(0) += 0.001f // cosine-dist ≈ 0 to v1
    val far = Array.fill(64)(rnd.nextFloat() - 0.9f)
    val source = MemoryStream[(Long, Seq[Float])]
    val params = graft.index.LshParams.adaptive(64)

    def run(): Unit = {
      val q = StreamingDedup.nearDupKeepVectors(
        source.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        s"$dir/store", s"$dir/ckpt", maxCosineDistance = 0.1, params,
        trigger = Trigger.AvailableNow())
      q.processAllAvailable(); q.awaitTermination()
    }

    // batch 1: v1 + an in-batch near-dup + one far vector
    source.addData((1L, v1.toSeq), (2L, v1near.toSeq), (3L, far.toSeq))
    run()
    val kept1 = StreamingDedup.readKept(spark, s"$dir/store")
      .collect().map(_.getAs[Long]("vec_id")).sorted.toSeq
    assert(kept1 === Seq(1L, 3L))

    // batch 2: a cross-batch near-dup of v1, an exact copy of far, a novel one
    val novel = Array.fill(64)(rnd.nextFloat() + 2f)
    source.addData((10L, v1near.toSeq), (11L, far.toSeq), (12L, novel.toSeq))
    run()
    val kept2 = StreamingDedup.readKept(spark, s"$dir/store")
      .collect().map(_.getAs[Long]("vec_id")).sorted.toSeq
    assert(kept2 === Seq(1L, 3L, 12L), s"got $kept2")
  }

  test("compact folds batch dirs into one; the store keeps deduping through it") {
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sneardup_cmp_${System.nanoTime()}"
    val store = s"$dir/store"
    val a = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val b = "completely different content about spark query engines and distributed joins at scale"
    val c = "unrelated words entirely standing alone here today in this corpus"
    def batch(bid: Long, rows: (Long, String)*): Unit =
      StreamingDedup.nearDupBatch(rows.toDF("doc_id", "text"), bid,
        "doc_id", "text", store, 0.8, 3, 128, 32)
    batch(0, (1L, a)); batch(1, (2L, b)); batch(2, (3L, c))
    val before = StreamingDedup.readKept(spark, store)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(before === Seq(1L, 2L, 3L))

    StreamingDedup.compact(spark, store)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq("kept", "buckets").foreach { side =>
      val subdirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$store/$side"))
        .filter(_.isDirectory)
      assert(subdirs.length === 1, s"$side should hold one compacted dir, got ${subdirs.length}")
    }
    assert(StreamingDedup.readKept(spark, store)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq === before)

    // the compacted bucket index still catches a cross-batch near-dup
    batch(3, (10L, a.replace(" ", "  ")), (11L, "fresh novel content appearing only now"))
    val after = StreamingDedup.readKept(spark, store)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(after === Seq(1L, 2L, 3L, 11L), s"got $after")
  }

  test("nearDupKeep: an empty micro-batch commits cleanly and leaves the store intact") {
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sneardup_empty_${System.nanoTime()}"
    val seed = Seq((1L, "seed document with enough tokens to shingle today")).toDF("doc_id", "text")
    StreamingDedup.nearDupBatch(seed, 0L, "doc_id", "text", s"$dir/store", 0.8, 3, 128, 32)
    val empty = seed.limit(0)
    StreamingDedup.nearDupBatch(empty, 1L, "doc_id", "text", s"$dir/store", 0.8, 3, 128, 32)
    val kept = StreamingDedup.readKept(spark, s"$dir/store")
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(kept === Seq(1L))
  }

  test("nearDupBatch retry-replay: a replayed batch must not collide with its own prior output") {
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sneardup_retry_${System.nanoTime()}"
    val store = s"$dir/store"
    val a = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val b = "completely different content about spark query engines and distributed joins at scale"
    def batch(bid: Long, rows: (Long, String)*): Unit =
      StreamingDedup.nearDupBatch(rows.toDF("doc_id", "text"), bid,
        "doc_id", "text", store, 0.8, 3, 128, 32)

    batch(0, (1L, a))
    batch(1, (2L, b))
    // at-least-once crash window: kept/batch1 + buckets/batch1 committed
    // (_SUCCESS written) but the streaming checkpoint never recorded
    // batch 1 → the engine replays batch 1 with the SAME id and input.
    // Doc 2 is now IN the store; without the current-batch exclusion it
    // would collide with itself (jaccard 1.0) and the replay would
    // overwrite kept/batch1 with an empty frame — losing doc 2 forever.
    batch(1, (2L, b))
    val kept = StreamingDedup.readKept(spark, store)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept === Seq(1L, 2L),
      s"replayed batch must keep its own docs (dedup only vs earlier batches), got $kept")
    // and the replay must STILL drop true cross-batch dups (vs batch 0)
    batch(2, (3L, a.replace(" ", "  ")), (4L, "fresh novel content appearing only now"))
    batch(2, (3L, a.replace(" ", "  ")), (4L, "fresh novel content appearing only now"))
    val kept2 = StreamingDedup.readKept(spark, store)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept2 === Seq(1L, 2L, 4L), s"got $kept2")
  }

  test("nearDupVecBatch retry-replay: vector twin keeps its own docs on replay") {
    import sqlImplicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_svecdup_retry_${System.nanoTime()}"
    val store = s"$dir/store"
    val rnd = new scala.util.Random(7)
    val v1 = Array.fill(64)(rnd.nextFloat()).toSeq
    val far = Array.fill(64)(rnd.nextFloat() - 0.9f).toSeq
    val params = graft.index.LshParams.adaptive(64)
    def batch(bid: Long, rows: (Long, Seq[Float])*): Unit =
      StreamingDedup.nearDupVecBatch(rows.toDF("vec_id", "embedding"), bid,
        "vec_id", "embedding", store, 0.1, params)

    batch(0, (1L, v1))
    batch(1, (2L, far))
    batch(1, (2L, far)) // replay: must not self-collide via the code index
    val kept = StreamingDedup.readKept(spark, store)
      .collect().map(_.getAs[Long]("vec_id")).sorted.toSeq
    assert(kept === Seq(1L, 2L), s"got $kept")
  }

  test("urlDedupBatch: canonical-key dedup across batches; replay keeps its own docs") {
    import sqlImplicits._
    val store = s"${System.getProperty("java.io.tmpdir")}/graft_surl_spec_${System.nanoTime()}"
    def batch(bid: Long, rows: (Long, String)*): Unit =
      StreamingDedup.urlDedupBatch(rows.toDF("doc_id", "url"), bid,
        "doc_id", "url", store)
    // batch 0: two noise spellings of ONE page + a distinct page
    batch(0,
      (1L, "HTTP://WWW.A.com:80/x?utm_source=z&b=2&a=1"),
      (2L, "http://a.com/x?a=1&b=2#frag"),
      (3L, "http://b.com/y"))
    val kept0 = StreamingDedup.readKept(spark, store)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept0 === Seq(1L, 3L)) // min id wins within the batch
    // batch 1: a re-crawl of page A (must drop vs the STORE) + novel
    batch(1, (4L, "http://a.com/x/?b=2&a=1"), (5L, "http://c.com/z"))
    // replay of batch 1 (at-least-once): must keep its own docs
    batch(1, (4L, "http://a.com/x/?b=2&a=1"), (5L, "http://c.com/z"))
    val kept = StreamingDedup.readKept(spark, store)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept === Seq(1L, 3L, 5L), s"got $kept")
  }

  test("nearDupImageBatch: perceptual-hash dedup across batches via the stored hash index") {
    import sqlImplicits._
    import graft.pipeline.ImageDedup
    val store = s"${System.getProperty("java.io.tmpdir")}/graft_simg_spec_${System.nanoTime()}"
    def batch(bid: Long, rows: (Long, Array[Byte])*): Unit =
      StreamingDedup.nearDupImageBatch(rows.toDF("doc_id", "media"), bid,
        "doc_id", "media", store, 8, 4096)
    // plantEvery = 50: id 51 is a noised copy of id 50; 0 and 7 distinct
    batch(0, (0L, ImageDedup.makePng(0L, 0, 27, 16)),
             (50L, ImageDedup.makePng(50L, 0, 27, 16)))
    batch(1, (51L, ImageDedup.makePng(51L, 50, 27, 16)), // near-dup of 50
             (7L, ImageDedup.makePng(7L, 0, 27, 16)))
    // replay batch 1: must not collide with its own stored hashes
    batch(1, (51L, ImageDedup.makePng(51L, 50, 27, 16)),
             (7L, ImageDedup.makePng(7L, 0, 27, 16)))
    val kept = StreamingDedup.readKept(spark, store)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept === Seq(0L, 7L, 50L), s"got $kept")
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
