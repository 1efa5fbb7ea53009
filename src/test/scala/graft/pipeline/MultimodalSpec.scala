package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  private lazy val media = Multimodal.fromDocuments(docs)

  test("media table carries binary payload + typed metadata per kind") {
    val rows = media.collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      assert(Set("image", "audio", "video").contains(r.kind))
      assert(r.media.nonEmpty)
      if (r.kind == "audio") assert(r.sample_rate === 16000) else assert(r.sample_rate === 0)
    }
  }

  test("feature extraction is deterministic and batch-shaped (one pass per partition)") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.doc_id)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === 16))
    assert(f1.forall(_.features.forall(v => v >= -1f && v <= 1f)))
    // different payloads produce different features
    assert(f1.map(_.features.toSeq).distinct.length > 1)
  }

  test("mapPartitions stages preserve partitioning (no shuffle in the plan)") {
    val parts = media.rdd.getNumPartitions
    assert(Multimodal.extractFeatures(media).rdd.getNumPartitions === parts)
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("resize rewrites payload size and metadata") {
    val out = Multimodal.resize(media, 32, 32).collect()
    assert(out.forall(r => r.media.length === 32 * 32 && r.width === 32 && r.height === 32))
  }

  test("frame sampling explodes only video payloads with strided indices") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 === 0))
    val videoIds = media.filter($"kind" === "video").collect().map(_.doc_id).toSet
    assert(frames.map(_.doc_id).toSet.subsetOf(videoIds))
  }
}
