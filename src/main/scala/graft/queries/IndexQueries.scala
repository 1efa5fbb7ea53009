package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.index.{BinaryQuantization, HnswGraph, Ivf, IvfModel, LocalAnn, LocalHnsw, LocalNormIndex, Lsh, LshParams, PqModel, ProductQuantization}

/** Approximate-index query surface (SURVEY §2.8: LSH / BQ / PQ pipelines).
  * Every query here is deterministic end-to-end so the DuckDB oracle can
  * replay the full pipeline, not just the re-rank.
  */
object IndexQueries {

  /** Driver-side fetch of one embedding as the query vector. */
  private def embeddingOf(s: org.apache.spark.sql.SparkSession, dir: String, vecId: Long): Array[Float] =
    table(s, dir, "embeddings").filter(col("vec_id") === vecId)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray

  val defs: Map[String, Q] = Map(
    // BQ normal path: query vector is row 0, which packs to hamming 0 with
    // itself, so the <= min(dim/4,64)=16 prefilter always has candidates.
    "bq_knn" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      BinaryQuantization.search(e, "vec_id", "embedding", embeddingOf(s, dir, 0), k = 10,
        threshold = Some(bqThresholdFor(s, dir)), assumeCandidates = true)
    }),

    // BQ fallback path: a constant far-off query (all components 10.0 >>
    // data range) packs to all-ones; random data sits ~32 bits away, so no
    // vector passes the 16-bit prefilter and the 3k-closest-by-Hamming
    // fallback (BinaryQuantization.cs:167-174) is exercised.
    "bq_knn_fallback" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      BinaryQuantization.search(e, "vec_id", "embedding", Array.fill(64)(10.0f), k = 10,
        threshold = Some(bqThresholdFor(s, dir)))
    }),

    // LSH single-query kNN with reference-adaptive params (dim 64 → 8
    // tables × 6 sign-bit functions, seed 42). The oracle replays the FULL
    // bucket pipeline: the seed-42 hyperplanes are embedded as literals in
    // the SQL, so candidate selection AND re-rank are both checked.
    "lsh_knn" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Lsh.search(e, "vec_id", "embedding", embeddingOf(s, dir, 0), k = 10, lshP,
        assumeCandidates = true)
    }),

    // LSH radius search over the same bucket candidates.
    "lsh_range" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Lsh.rangeSearch(e, "vec_id", "embedding", embeddingOf(s, dir, 0), radius = 1.4, lshP)
    }),

    // LSH batch kNN: exploded-code equi-join (shuffle carries only bucket
    // collisions), bounded per-query top-k.
    "lsh_knn_batch" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Lsh.searchBatch(e, "vec_id", "embedding", q, "query_id", "qv", k = 5, lshP)
    }),

    // PQ kNN: seed-42 codebooks (4 blocks × 16 dims for the 64-dim table),
    // ADC scan, scale-law re-rank pool (max(64·k, 0.3·N) — derived from
    // the measured linear ADC-rank law, no hand-tuned constant), exact
    // re-rank. With the pool the deterministic result equals exact kNN,
    // which the oracle checks; a ScalaTest separately asserts the raw
    // ADC ordering's recall.
    "pq_knn" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      ProductQuantization.search(pqModelFor(s, dir), e, "vec_id", "embedding",
        embeddingOf(s, dir, 0), k = 10)
    }),

    // IVF probe-limited kNN (nprobe 4 of 16 coarse clusters — the
    // partition-pruned scale path). The coarse quantizer here is the
    // sampled-centroid variant (centroids = multiplicative-hash-ranked
    // table rows, Ivf.fitSampledCentroids), so the oracle replays the
    // ENTIRE pipeline — centroid selection, nearest-centroid assignment,
    // probe choice and the final top-k — in SQL. The k-means fit keeps
    // its own coverage in IvfSpec.
    "ivf_knn" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Ivf.search(ivfModelFor(s, dir), e, "vec_id", "embedding",
        embeddingOf(s, dir, 0), k = 10, nprobe = 4)
    }),

    // Composed IVF-ADC (IVFPQ): probe-pruned cells → compressed-domain
    // ADC scan → exact re-rank of the candidate pool. The PQ codebooks
    // are trained on coarse RESIDUALS (x − centroid; Jégou et al. TPAMI
    // 2011 §V's IVFADC, r7 verdict item 1) — residual encoding
    // concentrates quantization error, so the bounded ADC pool contains
    // the true top-k even for bunched queries (raw-vector codes put a
    // true neighbor at ADC rank 128 at sf0.1) and the output equals the
    // exact probe replay, restoring the full hash-match oracle (r8).
    "ivfpq_knn" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Ivf.searchPq(ivfModelFor(s, dir), ivfResPqFor(s, dir), e,
        "vec_id", "embedding", embeddingOf(s, dir, 0), k = 10, nprobe = 4,
        coded0 = Some(ivfpqCodedFor(s, dir)))
    }),

    // Batch IVF-ADC: per-(query, cell) residual ADC tables broadcast
    // with the probe pairs, collisions scored by table lookup over the
    // 8-byte codes, bounded ADC pool re-ranked exactly. Full-pipeline
    // oracle like ivf_knn_batch (residual codes, r8).
    "ivfpq_knn_batch" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Ivf.searchPqBatch(ivfModelFor(s, dir), ivfResPqFor(s, dir), e,
        "vec_id", "embedding", q, "query_id", "qv", k = 5, nprobe = 4,
        coded0 = Some(ivfpqCodedFor(s, dir)))
    }),

    // IVFPQ on the PLANTED fixture — the margin-unambiguous regime where
    // the full pipeline is provably exact, giving the compressed read
    // path a driver-checkable hash-match: 10 plants sit 0.001·i from
    // each query while the nearest corpus vector is ~1.0 away, so
    // (a) every plant's nearest IVF centroid is the query's rank-1 probe;
    // (b) plants quantize to the query's argmin codewords per block, so
    //     their ADC ≈ the MINIMUM possible table sum — no row can score
    //     below it, and the candidate pool must admit them;
    // (c) the exact re-rank separates plants from the corpus by ~100×.
    // Oracle = plain exact kNN over the fixture (same as hnsw planted).
    "ivfpq_knn_planted" -> ((s, dir) => {
      Ivf.searchPq(ivfModelFor(s, dir), ivfResPqFor(s, dir),
        plantedEmbeddings(s, dir), "vec_id", "embedding",
        embeddingOf(s, dir, 0), k = 10, nprobe = 4,
        coded0 = Some(plantedCodedFor(s, dir)))
    }),

    // The batch IVFPQ plumbing (per-query HOF ADC tables, AdcLookupExpr
    // scoring, bounded-heap pools) through the same provable regime:
    // three queries, each with its own 10 plants.
    "ivfpq_knn_batch_planted" -> ((s, dir) => {
      val q = table(s, dir, "embeddings").filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Ivf.searchPqBatch(ivfModelFor(s, dir), ivfResPqFor(s, dir),
        plantedEmbeddings(s, dir), "vec_id", "embedding",
        q, "query_id", "qv", k = 10, nprobe = 4,
        coded0 = Some(plantedCodedFor(s, dir)))
    }),

    // IVF batch kNN: per-query probe sets over the replayable sampled
    // centroids, probe pairs broadcast-joined against the assigned table,
    // bounded-heap per-query top-k. Full-pipeline oracle like ivf_knn.
    "ivf_knn_batch" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Ivf.searchBatch(ivfModelFor(s, dir), e, "vec_id", "embedding",
        q, "query_id", "qv", k = 5, nprobe = 4)
    }),

    // Single-query exact kNN answered from the persisted per-partition
    // norm index (LocalAnn — the mapPartitions KD-tree analog): warm
    // in-heap arrays + triangle-inequality pruning, no parquet rescan.
    // Exact by construction, so the oracle is plain exact kNN.
    "local_ann_knn" -> ((s, dir) => {
      LocalAnn.search(localAnnFor(s, dir), s, embeddingOf(s, dir, 0), k = 10, "vec_id")
    }),

    // True-graph HNSW (arXiv:1603.09320), one graph per partition. The
    // build hash-repartitions by id, so graphs — and results — are
    // deterministic for a given dataset regardless of input splits; the
    // result is approximate (graph search), hence rows-only with
    // LocalHnswSpec carrying the recall ≥ 0.8 claim (the reference's own
    // HNSW bar).
    "hnsw_knn" -> ((s, dir) => {
      LocalHnsw.search(hnswFor(s, dir), s, embeddingOf(s, dir, 0), k = 10, "vec_id")
    }),

    // HNSW on a PLANTED fixture whose exact top-k is unambiguous by
    // margin (VERDICT r4 item 1): 10 plants sit at distance 0.001·i from
    // the query while the nearest corpus vector is orders of magnitude
    // farther, so the graph search provably-by-margin returns the exact
    // top-10 (query row itself + plants 1..9) and the oracle is plain
    // exact kNN over the same fixture — a driver-checkable hash-match
    // for the true-graph pipeline (build → layered descent → merge).
    // Plant floats are float32-exact on both engines (f32+f32 is exact
    // in f64, then rounds identically on the cast back).
    "hnsw_knn_planted" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = embeddingOf(s, dir, 0)
      val plants = (1 to 10).map { i =>
        val v = q.clone(); v(0) = v(0) + (0.001 * i).toFloat
        (1000000L + i, v.toSeq)
      }
      val sqlc = s
      import sqlc.implicits._
      val plantDf = plants.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>"))
      val fixture = e.select(col("vec_id"), col("embedding")).unionByName(plantDf)
      val graph = LocalHnsw.build(fixture.repartition(4, col("vec_id")), "vec_id", "embedding")
      val out = LocalHnsw.search(graph, s, q, k = 10, "vec_id")
      graph.unpersist(blocking = false)
      out
    }),

    // Measured HNSW recall vs exact brute-force top-k, pinned in the
    // DRIVER gate (r7 verdict item 5): 10 queries through the true-graph
    // serve path, truth from one distributed bounded-heap batch job.
    // recall_ok hash-matches TRUE only while mean recall ≥ 0.8 — the
    // reference's own bar (Tests/HNSWBenchmarkTests.cs:169-170), now in
    // CORRECTNESS_r{N}.json instead of only LocalHnswSpec.
    "hnsw_recall" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val k = 10
      val qFrame = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val truth = graft.ops.Knn.batch(e, "vec_id", "embedding",
          qFrame, "query_id", "qv", k)
        .select(col("query_id"), col("vec_id"))
      val idx = hnswFor(s, dir)
      val qs = qFrame.collect()
        .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
      val sqlc = s
      import sqlc.implicits._
      val found = qs.toSeq.flatMap { case (qid, q) =>
        LocalHnsw.searchTop(idx, q, k).map { case (_, id) => (qid, id) }
      }.toDF("query_id", "vec_id")
      PipelineQueries.recallFrame(truth, found, Seq("query_id", "vec_id"), floor = 0.8)
    }),

    // Measured IVFADC pool recall vs the exact probe replay, over 4× the
    // queries the hash-match oracle drives (vec_id < 20). This key is
    // what CAUGHT the r8 regression the 5-query oracles missed: with
    // 8-dim-block residual codes, 11/100 true pairs sat beyond the
    // 160-candidate pool at sf0.1 (worst ADC rank 423); the residual
    // codebooks now default to 4-dim blocks (fitResidualPq — worst rank
    // 30, 5× pool margin), restoring measured recall 1.0. Floor 0.9.
    "ivfpq_recall" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val truth = Ivf.searchBatch(ivfModelFor(s, dir), e, "vec_id", "embedding",
          q, "query_id", "qv", k = 5, nprobe = 4)
        .select(col("query_id"), col("vec_id"))
      val found = Ivf.searchPqBatch(ivfModelFor(s, dir), ivfResPqFor(s, dir), e,
          "vec_id", "embedding", q, "query_id", "qv", k = 5, nprobe = 4,
          coded0 = Some(ivfpqCodedFor(s, dir)))
        .select(col("query_id"), col("vec_id"))
      PipelineQueries.recallFrame(truth, found, Seq("query_id", "vec_id"), floor = 0.9)
    }),

    // Index ↔ table equi-join (SURVEY §2.3: the reference's HNSW load joins
    // persisted node ids back to vectors, HNSW.cs:392-418): the LSH codes
    // column is persisted as a standalone index table, re-read, and
    // equi-joined to the vector table; the oracle recomputes every code
    // from the hyperplane literals. Bench label: the index WRITE is inside
    // the timed body by design (persist→load→join is the operator under
    // test), so its bench number is a round-trip time, not a join time.
    "index_join" -> ((s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_index_join_${new java.io.File(dir).getName}"
      Lsh.withCodes(table(s, dir, "embeddings"), "embedding", lshP)
        .select(col("vec_id"), col("codes"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(col("vec_id"), explode(col("codes")).as("code"))
        .join(table(s, dir, "embeddings"), "vec_id")
        .select(col("vec_id"), col("code"), col("label"))
    }),

    // Pure packed-Hamming kernel over integer-derived words (bit_count(xor)
    // on both engines; vectors' own packing is covered by bq_knn above).
    "hamming_packed" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          Distances.hammingPacked(
            array(col("l_orderkey").cast("long"), col("l_partkey").cast("long")),
            array(col("l_suppkey").cast("long"), col("l_linenumber").cast("long"))).as("hp"))
    }))

  /** Adaptive params for the 64-dim embeddings table (LSHSearch.cs:228-230:
    * 8 tables × 6 functions, seed 42). */
  private[queries] val lshP = LshParams.adaptive(64)

  /** Codebook training is per-dataset, not per-query — memoize like a
    * persisted index (bench reps would otherwise re-fit every run). */
  private val pqModels = new java.util.concurrent.ConcurrentHashMap[String, PqModel]()
  private def pqModelFor(s: org.apache.spark.sql.SparkSession, dir: String): PqModel =
    pqModels.computeIfAbsent(dir,
      _ => ProductQuantization.fit(table(s, dir, "embeddings"), "embedding"))

  // persisted-RDD caches are session-scoped (blocks die with the context)
  private val localAnnIdx = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.rdd.RDD[LocalNormIndex]]()
  private def localAnnFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    localAnnIdx.computeIfAbsent(sessionKey(s, dir),
      _ => LocalAnn.build(table(s, dir, "embeddings"), "vec_id", "embedding"))

  private val hnswIdx = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.rdd.RDD[HnswGraph]]()
  private def hnswFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    hnswIdx.computeIfAbsent(sessionKey(s, dir), _ => LocalHnsw.build(
      table(s, dir, "embeddings").repartition(4, col("vec_id")), "vec_id", "embedding"))

  // IVFADC's own codebooks: trained on coarse residuals (x − centroid),
  // NOT the raw vectors pq_knn's model sees — Jégou §V; memoized like a
  // persisted index artifact
  private val ivfResPqModels = new java.util.concurrent.ConcurrentHashMap[String, PqModel]()
  private def ivfResPqFor(s: org.apache.spark.sql.SparkSession, dir: String): PqModel =
    ivfResPqModels.computeIfAbsent(dir,
      _ => Ivf.fitResidualPq(ivfModelFor(s, dir),
        table(s, dir, "embeddings"), "embedding"))

  // the IVF-PQ (cluster, codes) table is an index-BUILD artifact:
  // assign + residual + quantize run once per dataset and checkpoint; the
  // search verbs read only colliding cells of it per query
  private val ivfpqCoded = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private def ivfpqCodedFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    ivfpqCoded.computeIfAbsent(sessionKey(s, dir),
      _ => Ivf.codedTable(ivfModelFor(s, dir), ivfResPqFor(s, dir),
        table(s, dir, "embeddings"), "vec_id", "embedding").localCheckpoint(true))

  /** The planted-embeddings fixture as ONE shared DuckDB CTE — both
    * ivfpq planted oracles embed this text, so the SQL side has a single
    * definition to keep in lockstep with [[plantedEmbeddings]] (the
    * Scala builder); `PlantedFixtureDriftSpec` pins the builder's plant
    * arithmetic to the f32 semantics this text encodes. */
  private[queries] val plantedEmbCte =
    """qb AS (SELECT vec_id AS query_id, embedding AS qv
      |      FROM embeddings WHERE vec_id < 3),
      |plants AS (
      |  SELECT CAST(1000000 * (query_id + 1) + i AS BIGINT) AS vec_id,
      |    list_transform(generate_series(1, len(qv)), j ->
      |      CASE WHEN j = 1
      |        THEN CAST(CAST(qv[1] AS DOUBLE) + CAST(CAST(0.001 * i AS FLOAT) AS DOUBLE) AS FLOAT)
      |        ELSE qv[j] END) AS embedding
      |  FROM qb, generate_series(1, 10) t(i)),
      |fix AS (SELECT vec_id, embedding FROM embeddings
      |        UNION ALL SELECT vec_id, embedding FROM plants)""".stripMargin

  /** Corpus + 10 plants per query (vec_id < 3) at 0.001·i along dim 0 —
    * the margin-unambiguous IVFPQ fixture; plant float arithmetic matches
    * the oracle's f32+f32 replay exactly (hnsw_knn_planted's recipe).
    * Plant ids: 1e6·(query_id+1) + i. Memoized per dataset. */
  private val plantedEmb = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private[queries] def plantedEmbeddings(s: org.apache.spark.sql.SparkSession, dir: String) =
    plantedEmb.computeIfAbsent(sessionKey(s, dir), _ => {
      val e = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 3).collect()
      val plants = qs.toSeq.flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Float](1).toArray
        (1 to 10).map { i =>
          val v = qv.clone(); v(0) = v(0) + (0.001 * i).toFloat
          (1000000L * (qid + 1) + i, v.toSeq)
        }
      }
      val sqlc = s
      import sqlc.implicits._
      e.unionByName(plants.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>")))
        .localCheckpoint(true)
    })

  /** The planted fixture's (cluster, codes) build artifact. */
  private val plantedCoded = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private def plantedCodedFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    plantedCoded.computeIfAbsent(sessionKey(s, dir),
      _ => Ivf.codedTable(ivfModelFor(s, dir), ivfResPqFor(s, dir),
        plantedEmbeddings(s, dir), "vec_id", "embedding").localCheckpoint(true))

  private val ivfModels = new java.util.concurrent.ConcurrentHashMap[String, IvfModel]()
  private[queries] def ivfModelFor(s: org.apache.spark.sql.SparkSession, dir: String): IvfModel =
    ivfModels.computeIfAbsent(dir,
      _ => Ivf.fitSampledCentroids(table(s, dir, "embeddings"), "vec_id", "embedding", nlist = 16))

  // The BQ global-mean threshold is an index-build artifact, not a
  // per-query computation — memoize it per dataset like the models.
  private val bqThresholds = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  private def bqThresholdFor(s: org.apache.spark.sql.SparkSession, dir: String): Double =
    bqThresholds.computeIfAbsent(dir,
      _ => BinaryQuantization.globalMean(table(s, dir, "embeddings"), "embedding"))

  private def dlit(d: Double): String = java.lang.Double.toString(d)

  /** The seed-42 hyperplane constants as a DuckDB VALUES CTE — lets the
    * oracle recompute every bucket code with identical IEEE double ops. */
  private[queries] lazy val hpCte: String = {
    val rows = for (t <- 0 until lshP.tableCount; f <- 0 until lshP.hashFunctionCount) yield {
      val i = t * lshP.hashFunctionCount + f
      s"($t, $f, [${lshP.projections(i).map(dlit).mkString(",")}], ${dlit(lshP.biases(i))})"
    }
    s"hp AS (SELECT * FROM (VALUES ${rows.mkString(", ")}) AS t(tbl, f, proj, bias))"
  }

  /** Bucket code of every embedding per table: bit f set iff
    * dot(embedding, proj)+bias > 0 — sequential double fold on both engines. */
  private[queries] val vkeysCte: String =
    """vkeys AS (
      |  SELECT e.vec_id AS vec_id, hp.tbl AS tbl,
      |    sum(CASE WHEN list_reduce(list_transform(list_zip(e.embedding, hp.proj),
      |          p -> CAST(p[1] AS DOUBLE) * p[2]), (x,y) -> x+y) + hp.bias > 0
      |        THEN (1::BIGINT << hp.f) ELSE 0 END) AS key
      |  FROM embeddings e, hp GROUP BY 1, 2)""".stripMargin

  private val gmCte =
    """gm AS (SELECT avg(CAST(u AS DOUBLE)) AS t
      |       FROM (SELECT unnest(embedding) AS u FROM embeddings))""".stripMargin

  /** Count of sign-bit mismatches — the unpacked formulation of packed
    * Hamming distance (DuckDB cannot shift into bit 63, so the oracle
    * compares sign bits directly; the Spark side's packed words encode the
    * same predicate). */
  private def sqlSignHamming(a: String, b: String): String =
    s"""CAST(list_reduce(list_transform(list_zip($a, $b),
       | p -> CASE WHEN (CAST(p[1] AS DOUBLE) >= gm.t) != (CAST(p[2] AS DOUBLE) >= gm.t)
       |      THEN 1 ELSE 0 END), (x,y) -> x+y) AS BIGINT)""".stripMargin

  private val const10 = "[" + Seq.fill(64)("10.0").mkString(",") + "]"

  private val knnDistSql = sqlEuclid("e.embedding", "q.qv")

  /** The Knuth-hash centroid ranking of [[Ivf.fitSampledCentroids]]. */
  private val ivfHashExpr = "(CAST(vec_id AS BIGINT) * 2654435761) % 4294967296"

  /** Centroid + TOP-4 cell-assignment CTEs replaying
    * [[Ivf.fitSampledCentroids]] (Knuth-hash-ranked rows) and
    * [[graft.functions.TopCellsExpr]] ((squared-euclid, cid) order,
    * identical sequential-double fold) — the blocking key of the
    * IVF-blocked semantic dedup family's oracles in [[PipelineQueries]].
    * nlist is count-scaled like the Spark mining path: max(16, ⌈N/500⌉)
    * (identical to the 16-cell fixture at N ≤ 8000). */
  private[queries] lazy val ivfCellCtes: String =
    s"""cent AS (
       |  SELECT row_number() OVER (ORDER BY $ivfHashExpr, vec_id) - 1 AS cid,
       |         embedding AS cv
       |  FROM embeddings ORDER BY $ivfHashExpr, vec_id
       |  LIMIT (SELECT greatest(16, CAST(ceil(count(*) / 500.0) AS BIGINT)) FROM embeddings)),
       |acell AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id AS vec_id, c.cid AS cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${sqlEuclidSq("e.embedding", "c.cv")}, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c) WHERE rn <= 4)""".stripMargin

  /** Full IVF pipeline replay in SQL: the centroid CTE reproduces
    * `Ivf.fitSampledCentroids` (Knuth-hash-ranked rows), assignment and
    * probe choice compare raw squared distances with identical
    * sequential-double folds, then the exact top-10 runs on the probed
    * clusters. Shared by `ivf_knn` (which computes exactly this) and
    * `ivfpq_knn` (whose residual-ADC pool + exact re-rank must land on
    * the same rows). */
  private lazy val ivfExactProbeReplaySql: String =
    s"""WITH cent AS (
       |  SELECT row_number() OVER (ORDER BY $ivfHashExpr, vec_id) - 1 AS cid,
       |         embedding AS cv
       |  FROM embeddings ORDER BY $ivfHashExpr, vec_id LIMIT 16),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT c.cid AS cid FROM cent c, q
       |          ORDER BY ${sqlEuclidSq("c.cv", "q.qv")}, c.cid LIMIT 4),
       |assign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id AS vec_id, c.cid AS cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${sqlEuclidSq("e.embedding", "c.cv")}, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c) WHERE rn = 1)
       |SELECT e.vec_id AS vec_id, ${sqlEuclid("e.embedding", "q.qv")} AS dist
       |FROM embeddings e
       |JOIN assign a ON a.vec_id = e.vec_id
       |JOIN probe p ON p.cid = a.cid, q
       |ORDER BY dist, vec_id LIMIT 10""".stripMargin

  /** [[ivfExactProbeReplaySql]]'s multi-query form (5 queries, per-query
    * nprobe-4 probe sets, rank ≤ 5) — shared by `ivf_knn_batch` and
    * `ivfpq_knn_batch`. */
  private lazy val ivfExactProbeReplayBatchSql: String =
    s"""WITH cent AS (
       |  SELECT row_number() OVER (ORDER BY $ivfHashExpr, vec_id) - 1 AS cid,
       |         embedding AS cv
       |  FROM embeddings ORDER BY $ivfHashExpr, vec_id LIMIT 16),
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |      FROM embeddings WHERE vec_id < 5),
       |probe AS (
       |  SELECT query_id, cid FROM (
       |    SELECT q.query_id AS query_id, c.cid AS cid,
       |           row_number() OVER (PARTITION BY q.query_id
       |             ORDER BY ${sqlEuclidSq("c.cv", "q.qv")}, c.cid) AS rn
       |    FROM q CROSS JOIN cent c) WHERE rn <= 4),
       |assign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id AS vec_id, c.cid AS cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${sqlEuclidSq("e.embedding", "c.cv")}, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
       |d AS (
       |  SELECT q.query_id AS query_id, e.vec_id AS vec_id,
       |         ${sqlEuclid("e.embedding", "q.qv")} AS dist
       |  FROM embeddings e
       |  JOIN assign a ON a.vec_id = e.vec_id
       |  JOIN probe p ON p.cid = a.cid
       |  JOIN q ON q.query_id = p.query_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, dist
       |FROM (SELECT query_id, vec_id, dist,
       |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
       |      FROM d)
       |WHERE rank <= 5""".stripMargin

  val oracles: Map[String, String] = Map(
    // Exact kNN over the planted fixture — by construction the true
    // top-10 with an unambiguous margin, so the approximate graph result
    // must equal it bit-for-bit.
    "hnsw_knn_planted" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |plants AS (
         |  SELECT CAST(1000000 + i AS BIGINT) AS vec_id,
         |    list_transform(generate_series(1, len(qv)), j ->
         |      CASE WHEN j = 1
         |        THEN CAST(CAST(qv[1] AS DOUBLE) + CAST(CAST(0.001 * i AS FLOAT) AS DOUBLE) AS FLOAT)
         |        ELSE qv[j] END) AS embedding
         |  FROM q, generate_series(1, 10) t(i)),
         |fix AS (SELECT vec_id, embedding FROM embeddings
         |        UNION ALL SELECT vec_id, embedding FROM plants)
         |SELECT fix.vec_id AS vec_id, ${sqlEuclid("fix.embedding", "q.qv")} AS dist
         |FROM fix, q ORDER BY dist, fix.vec_id LIMIT 10""".stripMargin,

    "bq_knn" ->
      s"""WITH $gmCte,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |h AS (SELECT e.vec_id AS vec_id,
         |        ${sqlSignHamming("e.embedding", "q.qv")} AS hamming,
         |        ${sqlEuclid("e.embedding", "q.qv")} AS dist
         |      FROM embeddings e, q, gm)
         |SELECT vec_id, hamming, dist FROM h
         |WHERE hamming <= 16 ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    // Regime-aware replay of the reference's empty-only fallback
    // (Search/BinaryQuantization.cs:171-179): candidates under the
    // prefilter win when ANY exist (even fewer than k — the reference
    // returns a short result, not a fallback); only a fully-empty
    // prefilter falls back to the 3k closest by Hamming. The r10 sf1
    // sweep caught the old unconditional-fallback oracle: at 20k vectors
    // one random code slips under the 16-bit bar and the engines split.
    "bq_knn_fallback" ->
      s"""WITH $gmCte,
         |h AS (SELECT e.vec_id AS vec_id,
         |        ${sqlSignHamming("e.embedding", const10)} AS hamming,
         |        ${sqlEuclid("e.embedding", const10)} AS dist
         |      FROM embeddings e, gm),
         |cand AS (SELECT * FROM h WHERE hamming <= 16),
         |fb AS (SELECT * FROM h ORDER BY hamming, vec_id LIMIT 30),
         |sel AS (SELECT * FROM cand
         |        UNION ALL
         |        SELECT * FROM fb WHERE NOT EXISTS (SELECT 1 FROM cand))
         |SELECT vec_id, hamming, dist FROM sel ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "lsh_knn" ->
      s"""WITH $hpCte,
         |$vkeysCte,
         |qk AS (SELECT tbl, key FROM vkeys WHERE vec_id = 0),
         |cand AS (SELECT DISTINCT v.vec_id AS vec_id FROM vkeys v
         |         JOIN qk ON v.tbl = qk.tbl AND v.key = qk.key),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id AS vec_id, ${sqlEuclid("e.embedding", "q.qv")} AS dist
         |FROM embeddings e JOIN cand c ON e.vec_id = c.vec_id, q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "lsh_range" ->
      s"""WITH $hpCte,
         |$vkeysCte,
         |qk AS (SELECT tbl, key FROM vkeys WHERE vec_id = 0),
         |cand AS (SELECT DISTINCT v.vec_id AS vec_id FROM vkeys v
         |         JOIN qk ON v.tbl = qk.tbl AND v.key = qk.key),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, dist FROM (
         |  SELECT e.vec_id AS vec_id, ${sqlEuclid("e.embedding", "q.qv")} AS dist
         |  FROM embeddings e JOIN cand c ON e.vec_id = c.vec_id, q)
         |WHERE dist <= 1.4 ORDER BY dist, vec_id""".stripMargin,

    "lsh_knn_batch" ->
      s"""WITH $hpCte,
         |$vkeysCte,
         |qk AS (SELECT vec_id AS query_id, tbl, key FROM vkeys WHERE vec_id < 5),
         |cand AS (SELECT DISTINCT qk.query_id AS query_id, v.vec_id AS vec_id
         |         FROM vkeys v JOIN qk ON v.tbl = qk.tbl AND v.key = qk.key),
         |qv AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
         |d AS (SELECT c.query_id AS query_id, c.vec_id AS vec_id,
         |        ${sqlEuclid("e.embedding", "qv.qv")} AS dist
         |      FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
         |                  JOIN qv ON qv.query_id = c.query_id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, dist
         |FROM (SELECT query_id, vec_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
         |      FROM d)
         |WHERE rank <= 5""".stripMargin,

    // With the scale-law re-rank pool (max(64·k, 0.3·N)) the PQ result
    // is exactly the true top-10 — so the oracle is plain exact kNN. If
    // the codebook degraded (non-determinism, bad training) the pool
    // would leak a wrong candidate and this hash-mismatch.
    "pq_knn" ->
      s"""SELECT e.vec_id AS vec_id, $knnDistSql AS dist
         |FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    // LocalAnn is exact (lossless norm pruning) — the oracle is the same
    // exact top-k the brute-force scan answers.
    "local_ann_knn" ->
      s"""SELECT e.vec_id AS vec_id, $knnDistSql AS dist
         |FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    // Full IVF pipeline replay: the centroid CTE reproduces
    // Ivf.fitSampledCentroids (Knuth-hash-ranked rows), assignment and
    // probe choice compare raw squared distances with identical
    // sequential-double folds, and only then does the exact top-k run on
    // the probed clusters.
    "ivf_knn" -> ivfExactProbeReplaySql,

    // IVF-ADC must land on the SAME rows as the probe replay's exact
    // top-k: the residual-encoded ADC pool (Jégou §V) has to contain the
    // true top-10 of the probed cells, and the exact re-rank then
    // restores exact distances and order. Any ADC-induced miss
    // hash-mismatches this oracle. (Restored in r8 — raw-vector codes
    // could not sustain this at sf0.1; residual codes can.)
    "ivfpq_knn" -> ivfExactProbeReplaySql,

    "ivfpq_knn_planted" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |$plantedEmbCte
         |SELECT fix.vec_id AS vec_id, ${sqlEuclid("fix.embedding", "q.qv")} AS dist
         |FROM fix, q ORDER BY dist, fix.vec_id LIMIT 10""".stripMargin,

    "ivfpq_knn_batch_planted" ->
      s"""WITH $plantedEmbCte,
         |d AS (SELECT qb.query_id AS query_id, fix.vec_id AS vec_id,
         |        ${sqlEuclid("fix.embedding", "qb.qv")} AS dist
         |      FROM fix, qb)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, dist
         |FROM (SELECT query_id, vec_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
         |      FROM d)
         |WHERE rank <= 10""".stripMargin,

    "ivf_knn_batch" -> ivfExactProbeReplayBatchSql,

    // the batch IVFADC pipeline against the same exact batch replay
    "ivfpq_knn_batch" -> ivfExactProbeReplayBatchSql,

    // recall gates (r7 item 5): true_pairs is the exact denominator size
    // (queries × k, both data-derived), recall_ok pinned TRUE — a hash
    // mismatch means measured recall fell through the documented floor
    "hnsw_recall" ->
      """SELECT CAST(10 * least(10, (SELECT count(*) FROM embeddings)) AS BIGINT) AS true_pairs,
        |       CAST(0.8 AS DOUBLE) AS recall_floor, TRUE AS recall_ok""".stripMargin,

    "ivfpq_recall" ->
      """SELECT CAST(5 * least(20, (SELECT count(*) FROM embeddings)) AS BIGINT) AS true_pairs,
        |       CAST(0.9 AS DOUBLE) AS recall_floor, TRUE AS recall_ok""".stripMargin,

    "index_join" ->
      s"""WITH $hpCte,
         |$vkeysCte
         |SELECT v.vec_id AS vec_id,
         |  (CAST(v.tbl AS BIGINT) << 32) | CAST(v.key AS BIGINT) AS code,
         |  e.label AS label
         |FROM vkeys v JOIN embeddings e ON e.vec_id = v.vec_id""".stripMargin,

    "hamming_packed" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(bit_count(xor(CAST(l_orderkey AS BIGINT), CAST(l_suppkey AS BIGINT)))
        |    + bit_count(xor(CAST(l_partkey AS BIGINT), CAST(l_linenumber AS BIGINT))) AS BIGINT) AS hp
        |FROM lineitem WHERE l_orderkey <= 2000""".stripMargin)
}
