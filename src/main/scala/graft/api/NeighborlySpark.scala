package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{VectorRecord, VectorSchema}
import graft.functions.Distances
import graft.index.{Lsh, LshParams, PqModel}
import graft.index.{BinaryQuantization => BqIndex, ProductQuantization => PqIndex}
import graft.io.{ContentType, Etl}
import graft.meta.TagDictionary
import graft.ops.{EmbeddingProvider, HashEmbeddingProvider, Knn, RangeSearch, TextSearch, ThresholdFilter}

/** Search-algorithm names (reference enum:
  * Neighborly/Search/SearchAlgorithm.cs:9-19). */
object SearchAlgorithm extends Enumeration {
  val BallTree, KDTree, Linear, LSH, HNSW, Range, BinaryQuantization, ProductQuantization = Value
}

/** The `VectorDatabase` facade re-expressed over a Spark table
  * (reference: Neighborly/VectorDatabase.cs:37-109,192-307,371-441).
  *
  * Observable semantics reproduced:
  *  - CRUD verbs: add/get/update/remove by id; `updateVector` preserves the
  *    id but DROPS tags and attributes — the reference constructs the
  *    replacement from `(values, text)` only (VectorList.cs:184-187);
  *  - `search(text | vector, k, algorithm, threshold)` dispatching on the
  *    full `SearchAlgorithm` enum: KDTree/BallTree names serve the same
  *    exact result as Linear (their observable contract — SURVEY §2.8),
  *    answered from the warm per-partition norm index once
  *    `buildAllIndexes` has run; HNSW is served by the true
  *    Malkov-Yashunin graph after `buildAllIndexes` (recall-tuned LSH
  *    before — the declared substitution for the un-built state);
  *    `Range` is not a kNN algorithm and returns an empty result, matching
  *    the reference's switch default (SearchService.cs:164-166);
  *  - threshold semantics incl. the high-dim bypass applied post-dispatch
  *    (SearchService.cs:171-189);
  *  - `rangeSearch` gated to Linear/Range/KDTree — every other name throws,
  *    mirroring NotSupportedException (SearchService.cs:246-247);
  *  - snapshot save/load as parquet (vector table + tag dictionary) —
  *    Neighborly's gzip'd vectors.bin becomes engine-native columnar
  *    storage (VectorDatabase.cs:371-499,642-730);
  *  - import/export through the ETL layer (VectorDatabase.cs:747-800).
  *
  * Concurrency (documented divergence): the reference wraps VectorList in
  * reader/writer locks and ships a deterministic scripted-schedule test
  * framework (Tests/ConcurrencyTestFramework.cs:10-50,
  * DeterministicConcurrencyTests.cs:30-226). This facade is SINGLE-WRITER
  * by design — the Spark driver owns the table variable, exactly one
  * mutator at a time (the served API dispatches serially,
  * `VectorHttpServer`); reads are immutable DataFrame snapshots, so
  * readers never observe partial mutations — the lock-free equivalent of
  * the reference's guarantee. Multi-writer coordination is out of scope.
  *
  * Scale note: point CRUD rebuilds the logical plan (filter + union of a
  * 1-row frame) — fine for the reference's verb-level API; bulk paths are
  * `addVectors`/`importData`. To keep long interactive sessions honest,
  * every `checkpointEvery` point mutations the plan is truncated with an
  * eager `localCheckpoint` (analysis time stays O(1) instead of growing
  * with the mutation count). Search plans are the library's scale-safe
  * pipelines unchanged.
  */
class NeighborlySpark(val spark: SparkSession, val dimension: Int,
    initialEmbeddingProvider: EmbeddingProvider = HashEmbeddingProvider(),
    val checkpointEvery: Int = 32,
    val autoRebuild: Boolean = false,
    val autoRebuildDelayMs: Long = 5000) {

  private var provider: EmbeddingProvider = initialEmbeddingProvider

  /** The active text-embedding provider (EmbeddingGenerationInfo analog). */
  def embeddingProvider: EmbeddingProvider = provider

  /** SetEmbeddingGenerationInfo parity (VectorDatabase.cs:166-174):
    * swap the provider used by text search and vector generation. */
  def setEmbeddingProvider(p: EmbeddingProvider): Unit = { provider = p }

  /** GenerateVector parity (VectorDatabase.cs:176-190): embed a text into
    * a record carrying it as `original_text` — NOT added to the table,
    * exactly like the reference's factory verb. */
  def generateVector(originalText: String): VectorRecord = {
    require(originalText != null && originalText.nonEmpty, "Original text cannot be null or empty")
    VectorRecord("", provider.embed(originalText), original_text = originalText)
  }

  /** IsReadOnly parity (VectorDatabase.cs:134). */
  def isReadOnly: Boolean = false

  val tags: TagDictionary = TagDictionary.empty

  @volatile private var df: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], VectorSchema.schema)
  @volatile private var pqModel: Option[PqModel] = None
  @volatile private var bqThreshold: Option[Double] = None

  /** Per-partition local indexes over a SURROGATE long key (xxhash64 of
    * the string id — the facade's UUIDs can't key the long-indexed local
    * structures directly): exact warm kNN (LocalAnn) serves the
    * KDTree/BallTree names, the true Malkov-Yashunin graph serves HNSW.
    * Built by [[buildAllIndexes]]; invalidated (and their heap blocks
    * freed) on ANY mutation — a deliberate tightening of the reference's
    * stale-until-rebuild indexes: after a write we fall back to the
    * always-fresh scan/LSH paths instead of serving stale graph results.
    * With `autoRebuild = true` the reference's full "write → quiet
    * period → warm reads come back on their own" lifecycle
    * (VectorDatabase.cs:124,501-540) is reproduced on top of that
    * safety: a debounced lowest-priority daemon re-runs
    * [[buildAllIndexes]] after `autoRebuildDelayMs` without writes. */
  /** `records` is the warm table keyed by surrogate id as a PERSISTED
    * pair RDD — the serve path's record fetch: after the index probe
    * returns k (surrogate, dist) hits driver-side, one raw RDD
    * filter-collect yields the full records with no Catalyst planning,
    * no exchange, no AQE staging in the request path (each of which cost
    * more than the whole probe at serving size). Costs one extra
    * deserialized copy of the table while indexes are warm — the
    * explicit serving-tier trade, released on invalidation. */
  private case class LocalIdx(mapping: DataFrame,
      ann: org.apache.spark.rdd.RDD[graft.index.LocalNormIndex],
      hnsw: org.apache.spark.rdd.RDD[graft.index.HnswGraph],
      records: org.apache.spark.rdd.RDD[(Long, VectorRecord)])
  @volatile private var localIdx: Option[LocalIdx] = None
  @volatile private var cachedDf: Option[DataFrame] = None

  /** True when the KDTree/BallTree/HNSW names currently serve from warm
    * local indexes (vs the always-fresh scan/LSH fallback). */
  def hasWarmIndexes: Boolean = localIdx.isDefined

  // ----- debounced background rebuild (VectorDatabase.cs:124,501-540:
  // vectors modified → BuildAllIndexes ≥5 s later on a lowest-priority
  // background thread). Opt-in (`autoRebuild = true`); the documented
  // always-fresh fallback still covers the window between a mutation and
  // the rebuild — warm indexes are invalidated ON the mutation and come
  // back automatically after `autoRebuildDelayMs` of quiet. A rebuild
  // that a mutation overtakes mid-fit is DISCARDED (epoch guard), so a
  // freshly-installed index can never serve ids deleted during its fit.
  private val mutationEpoch = new java.util.concurrent.atomic.AtomicLong
  @volatile private var pendingRebuild: Option[java.util.concurrent.ScheduledFuture[_]] = None
  private val rebuildExec: Option[java.util.concurrent.ScheduledExecutorService] =
    if (!autoRebuild) None
    else Some(java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-auto-rebuild")
      t.setDaemon(true)
      t.setPriority(Thread.MIN_PRIORITY) // the reference's "lowest priority"
      t
    }))

  /** Debounce: every mutation cancels the pending rebuild and re-arms the
    * timer, so the rebuild runs once per quiet period, not per write. */
  private def scheduleRebuild(): Unit = rebuildExec.foreach { ex =>
    pendingRebuild.foreach(_.cancel(false))
    // a mutation after (or racing) close() must stay the pre-daemon
    // benign no-op, not a RejectedExecutionException from the
    // shut-down executor (r6 review)
    if (!ex.isShutdown)
      try pendingRebuild = Some(ex.schedule(new Runnable {
        override def run(): Unit =
          try rebuildIfQuiet()
          catch { case e: Throwable => System.err.println(s"[graft] auto-rebuild failed: $e") }
      }, autoRebuildDelayMs, java.util.concurrent.TimeUnit.MILLISECONDS))
      catch { case _: java.util.concurrent.RejectedExecutionException => () }
  }

  /** One background rebuild attempt: fit OUTSIDE the lock against a
    * snapshot, install under the lock only if no mutation raced the fit
    * (`onFitted` is a deterministic race hook for the spec). Returns
    * true when the fit installed, false when a racing mutation overtook
    * it and the fit was discarded (the mutation's own debounce — or the
    * explicit path's retry loop — then owns the refresh). */
  private[api] def rebuildIfQuiet(onFitted: () => Unit = () => ()): Boolean = {
    val (e0, snapshot) = synchronized { (mutationEpoch.get(), df) }
    val cached = snapshot.cache()
    // a failed fit must not pin the snapshot cache forever (r6 review;
    // artifacts the fit created before throwing are best-effort — the
    // ContextCleaner reclaims unreferenced checkpoint blocks)
    val fitted =
      try fitIndexes(cached)
      catch { case t: Throwable =>
        // never evict the LIVE serving cache: on a quiet store the
        // snapshot IS the installed cachedDf — dropping its entry on the
        // error path would silently cold-path every read until the next
        // successful install
        if (!cachedDf.exists(_ eq cached)) cached.unpersist(false)
        throw t
      }
    onFitted()
    synchronized {
      if (mutationEpoch.get() == e0) { install(cached, fitted); true }
      else { // a mutation overtook this fit: its own timer owns the rebuild
        cached.unpersist(false)
        discard(fitted)
        false
      }
    }
  }

  /** Dispose parity (VectorDatabase.cs:837): detach the metrics listener
    * and release every block this facade owns (cached table, local
    * indexes). The SparkSession itself is caller-owned. */
  def close(): Unit = {
    rebuildExec.foreach(_.shutdownNow())
    spark.sparkContext.removeSparkListener(metrics)
    synchronized {
      invalidateLocalIndexes()
      cachedDf.foreach(_.unpersist(false))
      cachedDf = None
    }
  }

  private def invalidateLocalIndexes(): Unit = {
    localIdx.foreach { li =>
      li.ann.unpersist(blocking = false)
      li.hnsw.unpersist(blocking = false)
      li.records.unpersist(blocking = false)
      org.apache.spark.sql.graft.bridge.freeCheckpoint(li.mapping)
    }
    localIdx = None
  }

  /** Translate a local-index hit frame (_sid, dist) back to string ids:
    * the k-row hit set broadcasts into the mapping join — one action.
    * Takes the LocalIdx the caller matched on (never re-reads the
    * volatile `localIdx`, which the background installer may swap). */
  private def mapHits(li: LocalIdx, hits: DataFrame): DataFrame =
    // k-row result: a global orderBy would range-partition (an extra
    // sampling job + exchange per serve request); coalesce(1) + local
    // sort is the same total order with none of that — the dominant
    // serve-path latency before the r6 trim (p50 ~170 → ~70 ms)
    li.mapping.join(broadcast(hits), "_sid")
      .select(col("id"), col("dist"))
      .coalesce(1)
      .sortWithinPartitions(col("dist"), col("id"))

  def vectors: DataFrame = df
  def count: Long = df.count()

  /** Observability (VectorDatabase.cs:218,342-348 analog): per-search
    * span metrics, a Spark-listener job counter for the serving path, and
    * an observable vector-count gauge reading the LIVE table. */
  val metrics: NeighborlyMetrics = {
    val m = new NeighborlyMetrics(() => count,
      s"${NeighborlyMetrics.ServeGroup}/${Integer.toHexString(System.identityHashCode(this))}")
    spark.sparkContext.addSparkListener(m)
    m
  }

  private var mutations = 0
  private var unsaved = false

  /** HasUnsavedChanges parity (VectorDatabase.cs:153): true after any
    * mutation since the last save/load. */
  def hasUnsavedChanges: Boolean = unsaved

  /** Plan-growth guard: after `checkpointEvery` point mutations, replace
    * the ever-growing union/filter lineage with its materialized result.
    * Synchronized against the background installer: the epoch bump and
    * the index invalidation must be atomic w.r.t. an install's epoch
    * check, or a stale fit could land right after an invalidation. */
  /** Swap the table and record the mutation under ONE lock acquisition:
    * a background install checks the epoch under this same lock, so it
    * can never observe the new epoch without the new table or the new
    * table without the epoch bump — a torn pair would let an epoch-clean
    * install overwrite `df` and silently revert the write (r6 review). */
  private def mutate(newDf: => DataFrame): Unit = {
    synchronized {
      df = newDf
      mutations += 1
      mutationEpoch.incrementAndGet()
      unsaved = true
      invalidateLocalIndexes()
      if (checkpointEvery > 0 && mutations % checkpointEvery == 0)
        df = df.localCheckpoint(true)
    }
    scheduleRebuild()
  }

  private def toRow(r: VectorRecord): DataFrame =
    spark.createDataFrame(java.util.List.of(Row(
      r.id, r.values.toSeq, r.tags.toSeq, r.original_text, r.priority, r.user_id, r.org_id)),
      VectorSchema.schema)

  /** Add one vector; generates a UUID id when blank (Vector.cs:25,56). */
  def addVector(r: VectorRecord): String = {
    val id = if (r.id == null || r.id.isEmpty) java.util.UUID.randomUUID().toString else r.id
    require(r.values.length == dimension,
      s"dimension ${r.values.length} != table dimension $dimension (enforced at ingest, SURVEY §1.4)")
    mutate(df.unionByName(toRow(r.copy(id = id))))
    id
  }

  /** Bulk ingest (the scale path). */
  def addVectors(rows: DataFrame): Unit = {
    VectorSchema.validateDimension(rows, "values", dimension)
    mutate(df.unionByName(rows.select(VectorSchema.schema.fieldNames.map(col): _*)))
  }

  def getVector(id: String): Option[VectorRecord] =
    df.filter(col("id") === id).collect().headOption.map(rowToRecord)

  private def rowToRecord(r: Row): VectorRecord = VectorRecord(
    r.getAs[String]("id"),
    r.getAs[scala.collection.Seq[Float]]("values").toArray,
    r.getAs[scala.collection.Seq[Short]]("tags").toArray,
    r.getAs[String]("original_text"),
    r.getAs[Byte]("priority"), r.getAs[Long]("user_id"), r.getAs[Long]("org_id"))

  /** Update preserves the id but DROPS tags and attributes — the reference
    * builds the replacement from (values, text) only (VectorList.cs:184-187). */
  def updateVector(id: String, values: Array[Float], originalText: String = ""): Boolean = {
    if (getVector(id).isEmpty) false
    else {
      mutate(df.filter(col("id") =!= id)
        .unionByName(toRow(VectorRecord(id, values, original_text = originalText))))
      true
    }
  }

  def removeVector(id: String): Boolean = {
    if (getVector(id).isEmpty) false
    else { mutate(df.filter(col("id") =!= id)); true }
  }

  /** Bulk record insert: ONE union plan rewrite and ONE mutation for the
    * whole batch (vs N rewrites + N plan-growth ticks of per-record
    * `addVector`). Returns the assigned ids in input order — blank ids
    * get fresh UUIDs exactly like the point verb. Zero Spark actions. */
  def addVectorRecords(rs: Seq[VectorRecord]): Seq[String] = {
    if (rs.isEmpty) return Seq.empty
    val withIds = rs.map { r =>
      require(r.values.length == dimension,
        s"dimension ${r.values.length} != table dimension $dimension (enforced at ingest, SURVEY §1.4)")
      if (r.id == null || r.id.isEmpty) r.copy(id = java.util.UUID.randomUUID().toString) else r
    }
    val rows: java.util.List[Row] = new java.util.ArrayList[Row](withIds.size)
    withIds.foreach(r => rows.add(Row(
      r.id, r.values.toSeq, r.tags.toSeq, r.original_text, r.priority, r.user_id, r.org_id)))
    mutate(df.unionByName(spark.createDataFrame(rows, VectorSchema.schema)))
    withIds.map(_.id)
  }

  /** Replace the whole table from an external snapshot in one swap + one
    * mutation epoch — the streaming-ingest refresh path (the micro-batch
    * analog of the reference's background rebuild reading the live
    * VectorList). Missing attribute columns default exactly like
    * `importData`; dimension is validated at the swap. */
  def replaceTable(rows: DataFrame): Unit = {
    VectorSchema.validateDimension(rows, "values", dimension)
    val have = rows.columns.toSet
    val defaults: Map[String, org.apache.spark.sql.Column] = Map(
      "tags" -> lit(Array.empty[Short]),
      "original_text" -> lit(""),
      "priority" -> lit(0.toByte),
      "user_id" -> lit(0L),
      "org_id" -> lit(0L))
    val full = VectorSchema.schema.fieldNames.foldLeft(rows) { (d, f) =>
      if (have.contains(f)) d else d.withColumn(f, defaults(f))
    }
    mutate(full.select(VectorSchema.schema.fieldNames.map(col): _*))
  }

  /** Bulk remove: ONE broadcast anti-join plan rewrite for the whole key
    * set (vs N existence jobs + N filter rewrites of per-key
    * `removeVector`). Absent ids are no-ops, matching the point verb's
    * observable outcome — including that an ALL-absent batch mutates
    * nothing (no dirty flag, no warm-index drop, no rebuild), which one
    * bounded existence probe (`limit(1)` semi-join) establishes before
    * the rewrite (r6 review: the unconditional path dirtied state and
    * dropped the warm serve tier for a no-op). */
  def removeVectors(ids: Seq[String]): Unit = {
    if (ids.isEmpty) return
    import spark.implicits._
    val keys = broadcast(ids.toDF("id"))
    // the probe only pays for itself when a no-op outcome would protect
    // observable state (a clean dirty flag, warm indexes, or the
    // debounce timer); on an already-dirty cold store the verb stays the
    // documented lazy plan rewrite
    val guardWorthwhile = !unsaved || hasWarmIndexes || rebuildExec.isDefined
    if (guardWorthwhile && df.join(keys, Seq("id"), "left_semi").limit(1).isEmpty) return
    mutate(df.join(keys, Seq("id"), "left_anti"))
  }

  /** Vectors.Clear parity (VectorService.cs:100-110): drops every row;
    * fitted index artifacts stay until the next buildAllIndexes, like the
    * reference's stale indexes after a clear. */
  def clear(): Unit = {
    // the one mutator NOT routed through mutate(): it also RESETS the
    // plan-growth counter (an empty table has no plan to truncate), so
    // it keeps its own copy of the swap+epoch+invalidate block — keep
    // the two in lockstep when touching mutation bookkeeping
    synchronized {
      df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], VectorSchema.schema)
      mutations = 0
      mutationEpoch.incrementAndGet()
      unsaved = true
      invalidateLocalIndexes()
    }
    scheduleRebuild()
  }

  /** kNN by raw vector (SearchService.cs:132-190 dispatch + threshold).
    * Returns (id, dist) ordered by (dist, id). */
  def search(query: Array[Float], k: Int,
      algorithm: SearchAlgorithm.Value = SearchAlgorithm.KDTree,
      similarityThreshold: Double = 0.5): DataFrame = {
    require(k > 0, "Number of neighbors must be greater than 0")
    import SearchAlgorithm._
    val raw = algorithm match {
      case KDTree | BallTree | Linear => localIdx match {
        // built index: exact warm kNN from the persisted per-partition
        // norm indexes — same rows as the scan (LocalAnn is lossless)
        case Some(li) => mapHits(li, graft.index.LocalAnn.search(
          li.ann, spark, query, k, "_sid"))
        case None => Knn.single(df, "id", "values", typedLit(query), k)
      }
      case LSH =>
        Lsh.search(df, "id", "values", query, k, LshParams.adaptive(dimension))
      case HNSW => localIdx match {
        // built index: the TRUE Malkov-Yashunin graph serves the name
        case Some(li) => mapHits(li, graft.index.LocalHnsw.search(
          li.hnsw, spark, query, k, "_sid"))
        // no index yet: recall-tuned LSH (declared substitution)
        case None => Lsh.search(df, "id", "values", query, k, LshParams.serving(dimension))
      }
      case SearchAlgorithm.BinaryQuantization =>
        BqIndex.search(df, "id", "values", query, k, threshold = bqThreshold)
          .select(col("id"), col("dist"))
      case SearchAlgorithm.ProductQuantization =>
        val m = pqModel.getOrElse { val f = PqIndex.fit(df, "values"); pqModel = Some(f); f }
        PqIndex.search(m, df, "id", "values", query, k, scannedRows = count)
      case Range => // not a kNN algorithm: the reference's switch default returns []
        df.limit(0).select(col("id"), lit(0.0).as("dist"))
    }
    ThresholdFilter(raw, "dist", similarityThreshold, dimension)
  }

  /** kNN returning FULL records with their distances in ONE Spark action
    * (VERDICT r3 item 3 — the serving path must not run k+1 driver jobs):
    * the k-row hit set broadcast-joins back to the table, mirroring the
    * reference's direct result mapping (VectorService.cs:74-84). Rows are
    * re-ordered driver-side by (dist, id) — k rows, trivial. Jobs run
    * under the `graft.serve` group so `metrics.serveJobs` can pin the
    * no-N+1 contract. */
  def searchRecords(query: Array[Float], k: Int,
      algorithm: SearchAlgorithm.Value = SearchAlgorithm.KDTree,
      similarityThreshold: Double = 0.5): Seq[(VectorRecord, Double)] = metrics.timed {
    // the job group wraps the WHOLE serving path: warm local-index
    // dispatches run their Spark jobs eagerly inside search(), and those
    // are exactly the jobs the no-N+1 counter must see
    spark.sparkContext.setJobGroup(metrics.serveGroup, s"searchRecords(k=$k, $algorithm)")
    try {
      import SearchAlgorithm._
      val warmLocal = localIdx.filter(_ =>
        algorithm == KDTree || algorithm == BallTree || algorithm == Linear ||
        algorithm == HNSW)
      warmLocal match {
        // warm fast path: one RDD probe for the k (surrogate, dist) hits,
        // then one raw RDD filter-collect over the persisted record store
        // — no Catalyst planning, exchange, or AQE staging per request;
        // the threshold applies driver-side with the SAME semantics as
        // the plan-side filter (ThresholdFilter.applyLocal, property-
        // pinned equal in ThresholdFilterLocalSpec)
        case Some(li) =>
          val top = algorithm match {
            case HNSW => graft.index.LocalHnsw.searchTop(li.hnsw, query, k)
            case _ => graft.index.LocalAnn.searchTop(li.ann, query, k)
          }
          if (top.isEmpty) Seq.empty
          else {
            val bySid = top.map { case (d, sid) => sid -> d }.toMap
            val recs = li.records.filter(r => bySid.contains(r._1)).collect()
              .map { case (sid, rec) => (rec, bySid(sid)) }
              .sortBy { case (rec, d) => (d, rec.id) }
              .toSeq
            ThresholdFilter.applyLocal(recs, similarityThreshold, dimension)
          }
        // cold / non-local algorithms: two bounded k-row round-trips
        // instead of one action nesting the distributed hit subplan
        // inside a broadcast exchange (exchange build job + join job +
        // fused-plan analysis per request). Still O(1) jobs in k —
        // never the k+1 pattern.
        case None =>
          val hits = search(query, k, algorithm, similarityThreshold)
            .select(col("id"), col("dist")).collect()
          if (hits.isEmpty) Seq.empty
          else {
            val dist = hits.map(r => r.getString(0) -> r.getDouble(1)).toMap
            df.filter(col("id").isin(dist.keySet.toSeq: _*))
              .collect()
              .map(r => (rowToRecord(r), dist(r.getAs[String]("id"))))
              .sortBy { case (rec, d) => (d, rec.id) }
              .toSeq
          }
      }
    } finally spark.sparkContext.clearJobGroup()
  }

  /** kNN by text (SearchService.cs:104-131): default threshold heuristic,
    * embed, then the embedded query goes through the SAME algorithm
    * dispatch as a raw-vector search (Search(text) → Search(query, k,
    * method) in the reference), then the short-text prefix-union tail.
    * `Range` contributes an empty kNN stage (the switch default), so a
    * short text still gets its prefix matches and a long text none. */
  def search(text: String, k: Int, algorithm: SearchAlgorithm.Value,
      similarityThreshold: Option[Double]): DataFrame = {
    require(text != null && text.trim.nonEmpty, "Text cannot be null or empty")
    import SearchAlgorithm._
    // exact names use TextSearch's inline linear path; the rest dispatch
    val knnFn: Option[(Array[Float], Int) => DataFrame] = algorithm match {
      case KDTree | BallTree | Linear => None
      case LSH => Some((q, kk) =>
        Lsh.search(df, "id", "values", q, kk, LshParams.adaptive(dimension))
          .select(col("id"), col("dist")))
      case HNSW => Some((q, kk) => (localIdx match {
        case Some(li) => mapHits(li, graft.index.LocalHnsw.search(li.hnsw, spark, q, kk, "_sid"))
        case None => Lsh.search(df, "id", "values", q, kk, LshParams.serving(dimension))
      }).select(col("id"), col("dist")))
      case SearchAlgorithm.BinaryQuantization => Some((q, kk) =>
        BqIndex.search(df, "id", "values", q, kk, threshold = bqThreshold)
          .select(col("id"), col("dist")))
      case SearchAlgorithm.ProductQuantization => Some((q, kk) => {
        val m = pqModel.getOrElse { val f = PqIndex.fit(df, "values"); pqModel = Some(f); f }
        PqIndex.search(m, df, "id", "values", q, kk, scannedRows = count)
      })
      case Range => Some((_, _) => df.limit(0).select(col("id"), lit(0.0).as("dist")))
    }
    TextSearch.search(df, "id", "values", "original_text", text, k,
      embeddingProvider, similarityThreshold, knnFn = knnFn)
  }

  /** Radius search, gated exactly like the reference: only Linear, Range
    * and KDTree names support it (SearchService.cs:246-247). */
  def rangeSearch(query: Array[Float], radius: Double,
      algorithm: SearchAlgorithm.Value = SearchAlgorithm.Range,
      metric: String = "euclidean"): DataFrame = {
    import SearchAlgorithm._
    algorithm match {
      case Linear | Range | KDTree =>
        RangeSearch.single(df, "id", "values", typedLit(query), radius, metric)
      case other =>
        throw new UnsupportedOperationException(
          s"Range search is not supported for algorithm $other (parity with SearchService.cs:246-247)")
    }
  }

  /** Radius search by text (SearchService.cs RangeSearch(text, …): embed
    * then range, same algorithm gating). */
  def rangeSearch(text: String, radius: Double,
      algorithm: SearchAlgorithm.Value, metric: String): DataFrame = {
    require(text != null && text.trim.nonEmpty, "Text cannot be null or empty")
    rangeSearch(embeddingProvider.embed(text), radius, algorithm, metric)
  }

  /** Fit/refresh every index artifact — the facade analog of the
    * reference's debounced BuildAllIndexes (VectorDatabase.cs:501-540):
    * BQ global-mean threshold, PQ codebooks, and the per-partition local
    * indexes (exact norm index + true HNSW graphs) over surrogate keys;
    * LSH projections are pure functions of (dim, seed) and need no
    * fitting. */
  def buildAllIndexes(): Boolean = buildAllIndexes(() => ())

  /** Explicit-build body with the spec's deterministic race hook.
    *
    * The install is epoch-guarded exactly like the background path — an
    * unconditional `df = cached` would REVERT a mutation another thread
    * landed during the multi-second fit (r6 review). But unlike the
    * background path, an EXPLICIT caller-requested build must not be
    * silently discarded when overtaken (with `autoRebuild` off — the
    * embedded default — nothing would reschedule and the store would
    * serve cold with no signal): re-fit against the post-mutation table
    * up to [[NeighborlySpark.ExplicitBuildAttempts]] times, and return
    * whether an install landed so a caller under continuous mutation can
    * tell and retry on its own schedule. */
  private[api] def buildAllIndexes(onFitted: () => Unit): Boolean = {
    // explicit build: any pending debounced rebuild is now redundant.
    pendingRebuild.foreach(_.cancel(false))
    var attempt = 0
    var installed = false
    while (!installed && attempt < NeighborlySpark.ExplicitBuildAttempts) {
      attempt += 1
      installed = rebuildIfQuiet(onFitted)
    }
    if (!installed)
      System.err.println(s"[graft] buildAllIndexes: overtaken by mutations " +
        s"on all $attempt attempts; indexes not installed (store serves " +
        s"via the always-fresh fallback until a quieter retry)")
    installed
  }

  private case class FittedIndexes(bq: Double, pq: PqModel, local: Option[LocalIdx])

  /** Serving-tier partition clamp shared by every local-index artifact. */
  private def serveParts: Int =
    math.max(1, math.min(spark.sparkContext.defaultParallelism, 8))

  /** Build + materialize the warm record store (ONE shape for the fit
    * and load paths — r6 review: the two sites had drifted-in-waiting
    * copies of the clamp + materialize sequence). */
  private def buildRecordStore(table: DataFrame, mapping: DataFrame) = {
    val records = NeighborlySpark.recordsBySid(
      table.join(mapping, "id").repartition(serveParts))
    records.count()
    records
  }

  /** Fit every index artifact from a snapshot — runs Spark jobs but
    * touches NO facade state, so the background thread can run it without
    * blocking mutations. */
  private def fitIndexes(snapshot: DataFrame): FittedIndexes = {
    val bq = BqIndex.globalMean(snapshot, "values")
    val pq = PqIndex.fit(snapshot, "values")
    val local = if (snapshot.limit(1).count() == 0) None else {
      // ORDER-PRESERVING surrogate: the long key is the dense rank of the
      // string id (a distributed sort of ids only), so (dist, _sid)
      // tie-breaks inside the local indexes agree EXACTLY with the scan
      // path's (dist, id) ordering — a hashed surrogate would cut ties at
      // the k boundary differently. Collision-free by construction.
      val ranked = snapshot.select(col("id")).orderBy(col("id")).rdd
        .map(_.getString(0)).zipWithIndex()
        .map { case (id, i) => (i, id) }
      val parts = serveParts
      val mapping = spark.createDataFrame(ranked).toDF("_sid", "id")
        .coalesce(parts)
        .localCheckpoint(true)
      // ONE bounded-partition frame feeds both local index builds: the
      // serve path's per-request RDD job runs `parts` tasks, not the
      // session's shuffle width (32 near-empty tasks of scheduler
      // latency were most of the warm-path p50)
      val keyed = snapshot.select(col("id"), col("values")).join(mapping, "id")
        .select(col("_sid"), col("id"), col("values"))
        .repartition(parts, col("_sid"))
      Some(LocalIdx(mapping,
        graft.index.LocalAnn.build(keyed, "_sid", "values"),
        graft.index.LocalHnsw.build(keyed, "_sid", "values"),
        buildRecordStore(snapshot, mapping)))
    }
    FittedIndexes(bq, pq, local)
  }

  /** Install fitted artifacts (callers hold the lock). Cache ownership:
    * exactly one facade-cached frame at a time — the previous build's
    * CacheManager entry is released before the new one registers (persist
    * without a paired unpersist pins blocks forever). */
  private def install(cached: DataFrame, f: FittedIndexes): Unit = {
    cachedDf.filterNot(_ eq cached).foreach(_.unpersist(false))
    df = cached
    cachedDf = Some(cached)
    bqThreshold = Some(f.bq)
    pqModel = Some(f.pq)
    invalidateLocalIndexes()
    localIdx = f.local
  }

  /** Release a fitted build that lost its install race. */
  private def discard(f: FittedIndexes): Unit = f.local.foreach { li =>
    li.ann.unpersist(blocking = false)
    li.hnsw.unpersist(blocking = false)
    li.records.unpersist(blocking = false)
    org.apache.spark.sql.graft.bridge.freeCheckpoint(li.mapping)
  }

  /** Snapshot: parquet vector table + tag dictionary
    * (VectorDatabase.cs:642-711's SaveAsync analog). */
  def save(path: String): Unit = {
    df.write.mode("overwrite").parquet(s"$path/vectors")
    tags.toDF(spark).write.mode("overwrite").parquet(s"$path/tags")
    // V1-snapshot analog: persist fitted index artifacts alongside the table
    // (SearchService.cs:285-342 serializes indexes into the snapshot —
    // including the HNSW graph, HNSW.cs:392-418, which lands here as the
    // per-partition blob parquet)
    bqThreshold.foreach(t => graft.index.IndexStore.saveBqThreshold(spark, t, s"$path/indexes"))
    pqModel.foreach(m => graft.index.IndexStore.savePq(spark, m, s"$path/indexes"))
    localIdx match {
      case Some(li) =>
        graft.index.IndexStore.saveLocalAnn(spark, li.ann, s"$path/indexes")
        graft.index.IndexStore.saveHnsw(spark, li.hnsw, s"$path/indexes")
        li.mapping.write.mode("overwrite").parquet(s"$path/indexes/sid_mapping")
      case None =>
        // no live local index: REMOVE any local-index dirs a previous save
        // left at this path — otherwise a later load would resurrect
        // graphs built over an outdated vector set and serve deleted ids
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        Seq("local_ann", "hnsw", "sid_mapping").foreach { d =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/indexes/$d"), true)
        }
    }
    unsaved = false
  }

  /** LoadAsync analog: restores table + tag dictionary. */
  def load(path: String): Unit = synchronized {
    // epoch bump: a background fit captured before this load must not
    // install indexes built over the pre-load table
    mutationEpoch.incrementAndGet()
    pendingRebuild.foreach(_.cancel(false))
    df = spark.read.schema(VectorSchema.schema).parquet(s"$path/vectors")
    val loaded = spark.read.parquet(s"$path/tags").orderBy("tag_id").collect()
    loaded.foreach(r => tags.add(r.getAs[String]("tag")))
    bqThreshold =
      try Some(graft.index.IndexStore.loadBqThreshold(spark, s"$path/indexes"))
      catch { case _: Exception => None }
    pqModel =
      try Some(graft.index.IndexStore.loadPq(spark, s"$path/indexes"))
      catch { case _: Exception => None }
    invalidateLocalIndexes()
    localIdx =
      try {
        val mapping = spark.read.parquet(s"$path/indexes/sid_mapping")
          .localCheckpoint(true)
        Some(LocalIdx(mapping,
          graft.index.IndexStore.loadLocalAnn(spark, s"$path/indexes"),
          graft.index.IndexStore.loadHnsw(spark, s"$path/indexes"),
          buildRecordStore(df, mapping)))
      } catch { case _: Exception => None }
    unsaved = false
  }

  /** ETL import (VectorDatabase.cs:747-771): attributes default, matching
    * the reference's ETL record shape. */
  def importData(ct: ContentType, path: String): Unit = {
    val in = Etl.importData(spark, ct, path)
      .withColumn("priority", lit(0.toByte))
      .withColumn("user_id", lit(0L))
      .withColumn("org_id", lit(0L))
    addVectors(in)
  }

  def exportData(ct: ContentType, path: String): Unit =
    Etl.exportData(df, ct, path)
}

object NeighborlySpark {
  /** How many times an explicit [[NeighborlySpark!.buildAllIndexes()*
    * buildAllIndexes]] re-fits when mutations keep overtaking the
    * multi-second fit. Bounded: under CONTINUOUS writes an explicit
    * build could otherwise spin forever; after this many overtakes the
    * call returns false and the caller owns the retry schedule. */
  private[api] val ExplicitBuildAttempts = 3

  /** (surrogate, full record) pair RDD from a (table ⋈ sid-mapping)
    * frame, persisted MEMORY_AND_DISK — the warm serve path's record store.
    * Lives on the companion so the map closure captures no facade
    * instance (the class is not serializable, by design). */
  private[api] def recordsBySid(wide: DataFrame): org.apache.spark.rdd.RDD[(Long, VectorRecord)] =
    wide.select(col("_sid"), col("id"), col("values"), col("tags"),
        col("original_text"), col("priority"), col("user_id"), col("org_id"))
      .rdd
      .map(r => (r.getAs[Long]("_sid"), VectorHttpServer.rowToRecord(r)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
}
