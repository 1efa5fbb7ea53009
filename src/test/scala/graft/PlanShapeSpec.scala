package graft

/** Plan-shape regression guards: the build brief's discipline is that
  * each operator's PHYSICAL plan is the one you'd want at 100 TB — these
  * pin the load-bearing shapes (pushdown, broadcast choice, bounded
  * top-k, partial aggregation) so a refactor that silently degrades a
  * plan fails CI instead of showing up as bench drift.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q3_shipping: filters pushed to the parquet scan, dims broadcast, no cartesian") {
    val p = plan("q3_shipping")
    assert(p.contains("PushedFilters: [IsNotNull"), "scan filters must push down")
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q5_join: the 6-way join is broadcast-heavy with a single fact-side shuffle family") {
    val p = plan("q5_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >= 4 broadcast joins, got $broadcasts")
    assert(!p.contains("CartesianProduct"))
  }

  test("exact kNN compiles to TakeOrderedAndProject (bounded heap, no full sort)") {
    val p = plan("knn_euclidean")
    assert(p.contains("TakeOrderedAndProject"), s"want bounded top-k, got:\n${p.take(800)}")
    assert(!p.contains("GlobalSort") && !p.contains("Sort ["))
  }

  test("batch kNN partial-aggregates the bounded heap before its single shuffle") {
    val p = plan("knn_batch_100")
    assert(p.contains("ObjectHashAggregate"), "TopKAgg must run as a partial-aggregable UDAF")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the query set must broadcast against the table")
  }

  test("ivf_knn_batch: probe pairs broadcast, per-query top-k partial-aggregated") {
    val p = plan("ivf_knn_batch")
    assert(p.contains("BroadcastExchange"), "probe pairs must broadcast")
    assert(p.contains("ObjectHashAggregate"), "per-query top-k must partial-aggregate")
    assert(!p.contains("CartesianProduct"))
  }

  test("point lookup pushes the id predicate into the scan") {
    val p = plan("q_point_lookup")
    assert(p.contains("PushedFilters:") && (p.contains("EqualTo") || p.contains("In(")),
      s"point predicate must reach parquet, got:\n${p.take(800)}")
  }

  test("minhash near-dup mining is equi-join-only: no cross product at any stage") {
    // the 100 TB property: candidates come from banded (band, bucket)
    // equi-joins — a refactor that lets the pair mining degenerate into
    // batch × corpus must fail here, not at the cluster bill
    val p = plan("minhash_neardup")
    assert(!p.contains("CartesianProduct"), "banded mining must never cross-join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "banded mining must stay an equi-join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected a hash/merge equi-join, got:\n${p.take(800)}")
  }

  test("tag dictionary join broadcasts the dictionary side") {
    val p = plan("tag_lookup")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the bounded tag dictionary must broadcast, got:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("brute-force ANN top-k compiles to a bounded heap, not a global sort") {
    val p = plan("ann_cosine_topk")
    assert(p.contains("TakeOrderedAndProject"), s"want bounded top-k, got:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("corpus split and mixture sampling are shuffle-free narrow maps") {
    for (name <- Seq("corpus_split", "mixture_sample")) {
      val p = plan(name)
      assert(!p.contains("Exchange"),
        s"$name must ride the scan stage with zero shuffle, got:\n${p.take(800)}")
      assert(p.contains("*("), s"$name must stay inside a codegen span")
    }
  }

  test("quota sampling's pre-filter stage broadcasts the rate join and never cross-joins") {
    import org.apache.spark.sql.functions.col
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val counts = d.groupBy(col("source"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("_n"))
    val df = graft.pipeline.CorpusSampling.prefiltered(d, "source", counts,
      graft.pipeline.CorpusSampling.hashFraction(col("doc_id"), "pin"),
      quota = 3, margin = 4.0)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the O(#domains) rate frame must broadcast, got:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("cluster_quota_sample: the rank filter compiles to a Partial WindowGroupLimit") {
    val p = plan("cluster_quota_sample")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"per-cluster quota must heap-cap map-side before the exchange, got:\n${p.take(1200)}")
  }

  test("kmeans_assign / jl_project / embed_outliers stay single narrow kernel passes") {
    for (name <- Seq("kmeans_assign", "jl_project")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name grew a shuffle:\n${p.take(800)}")
      assert(p.contains("*("), s"$name fell out of whole-stage codegen:\n${p.take(800)}")
    }
    // embed_outliers keeps its two bounded aggregates but the residual
    // pass must be the codegen kernel, not a HOF fallback
    val p = plan("embed_outliers")
    assert(p.contains("centroid_dist2"), p.take(800))
    assert(!p.contains("aggregate(zip_with"), "HOF fallback crept back in")
  }

  test("html_extract / unigram_encode are single narrow codegen passes") {
    // the JlProject lesson: a kernel can silently fall out of
    // whole-stage codegen (Janino limits, nullable-path mistakes) and
    // nothing but this pin would notice
    for (name <- Seq("html_extract", "unigram_encode", "url_canonicalize")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name grew a shuffle:\n${p.take(800)}")
      assert(p.contains("*("), s"$name fell out of whole-stage codegen:\n${p.take(800)}")
    }
  }

  test("r13 kernels stay narrow: video hash, lang-id scoring, quality scoring") {
    // video_phash: AVI walk + per-frame decode + majority fold is ONE
    // narrow pass (fixture mapPartitions + kernel project, no shuffle)
    for (name <- Seq("video_phash", "lang_id", "quality_score")) {
      val p = plan(name)
      assert(!p.contains("Exchange"),
        s"$name must stay a narrow pass (model/weights ride the closure):\n${p.take(800)}")
    }
    // streaming image probe/verify path must stay equi-join-only
    val v = plan("video_neardup")
    assert(!v.contains("Cartesian") && !v.contains("BroadcastNestedLoop"),
      s"video_neardup must stay equi-join-only:\n${v.take(1200)}")
  }

  test("image/audio perceptual hashing stays narrow; near-dup mining is equi-join-only") {
    // hash frames: fixture build (mapPartitions) + kernel, no shuffle
    for (name <- Seq("image_phash", "audio_phash")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name grew a shuffle:\n${p.take(800)}")
    }
    // the banded candidate join must never degrade to a cross product
    for (name <- Seq("image_neardup", "audio_neardup")) {
      val p = plan(name)
      assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
        s"$name must stay equi-join-only:\n${p.take(1200)}")
    }
  }
}
