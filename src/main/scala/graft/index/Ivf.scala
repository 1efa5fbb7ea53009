package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * coarse-quantizer scale path for embedding search (build-brief
  * extension; the reference has no IVF, its ANN family is LSH/BQ/PQ).
  *
  * Two coarse-quantizer fits:
  *  - `fit`: MLlib k-means on a bounded seeded sample
  *    ([[Sampling.seededSample]] — the 100 TB-safe path; the single
  *    training partition never holds more than `trainSample` rows);
  *  - `fitSampledCentroids`: centroids are actual table rows picked by a
  *    multiplicative hash of the id — plain integer/float arithmetic that
  *    a SQL oracle can replay end-to-end (centroid selection, assignment,
  *    probe choice AND top-k), the strongest correctness check available
  *    for an approximate index. Using data points as coarse centroids is
  *    a standard IVF variant (random-subset coarse quantizer).
  *
  * The model holds raw float centers; `assign` computes the
  * nearest-centroid id with the codegen distance kernel + an
  * `array_min` over (dist, idx) structs — no MLlib, no UDF on the scan
  * path, whole-stage-codegen friendly. `cluster` is the partition key
  * you'd bucket the table by at 100 TB, so a probe scans only
  * `nprobe/nlist` of the data.
  */
final case class IvfModel(centers: Array[Array[Float]]) {
  def nlist: Int = centers.length

  /** Nearest `nprobe` centroid ids to the query, by euclidean,
    * ties broken by centroid id. */
  def probes(query: Array[Float], nprobe: Int): Seq[Int] =
    centers.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var j = 0
      while (j < math.min(query.length, c.length)) {
        val d = query(j).toDouble - c(j).toDouble; s += d * d; j += 1
      }
      (s, i)
    }.sortBy(p => (p._1, p._2)).take(nprobe).map(_._2).toSeq
}

object Ivf {

  /** k-means coarse centroids (seed 42) on a bounded deterministic sample;
    * the sample (not the table) is coalesced to one partition so the fit
    * is identical across sessions AND bounded at scale. */
  def fit(vectors: DataFrame, vecCol: String, nlist: Int = 16, seed: Long = 42,
      maxIter: Int = 20, trainSample: Int = 1 << 18): IvfModel = {
    val n = vectors.count()
    val k = math.min(math.min(nlist.toLong, n), trainSample.toLong).toInt
    val train = Sampling.seededSample(vectors, vecCol, n, trainSample, seed)
      .select(array_to_vector(col(vecCol)).as("_ivf_f")).coalesce(1).cache()
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("_ivf_f").setPredictionCol("_ivf_c").fit(train)
    train.unpersist()
    IvfModel(km.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Knuth multiplicative hash of the row id — 2654435761 = ⌊2³²/φ⌋.
    * Chosen because `(id * 2654435761) % 4294967296` is exactly
    * replayable as BIGINT arithmetic in any SQL engine. */
  private def idHash(idCol: String) =
    (col(idCol).cast("long") * lit(2654435761L)) % lit(4294967296L)

  /** Coarse centroids = the `nlist` table rows ranked first by the
    * multiplicative id hash. Deterministic, partition-independent, and —
    * unlike k-means — SQL-replayable, so `ivf_knn` gets a full
    * hash-match oracle. The collect is `nlist` rows (16ish), not data. */
  def fitSampledCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16): IvfModel = {
    val centers = vectors
      .select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"))
      .orderBy(idHash("_id"), col("_id"))
      .limit(nlist)
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("_v").toArray)
    IvfModel(centers)
  }

  /** Append the coarse cluster id (the IVF partition key): one codegen
    * argmin kernel over the centroid matrix ([[graft.functions.ArgMinDistExpr]] —
    * squared-euclidean, ties to the lower centroid id), O(1) codegen size
    * at any `nlist`. */
  def assign(model: IvfModel, vectors: DataFrame, vecCol: String,
      outCol: String = "cluster"): DataFrame =
    vectors.withColumn(outCol,
      graft.functions.ArgMinDistExpr(col(vecCol), model.centers))

  /** Probe-limited exact kNN: scans only the `nprobe` clusters nearest the
    * query. With cluster-partitioned storage this is the fraction of data
    * actually read. */
  def search(model: IvfModel, vectors: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, nprobe: Int = 4,
      metric: String = "euclidean"): DataFrame = {
    val probeSet = model.probes(query, nprobe)
    assign(model, vectors, vecCol)
      .filter(col("cluster").isin(probeSet: _*))
      .withColumn("dist", round(Distances.metric(metric)(col(vecCol), typedLit(query)), 6))
      .select(col(idCol), col("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** IVF-ADC kNN — the composed IVFPQ layout (Jégou, Douze & Schmid,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011,
    * §V's IVFADC): the coarse cells prune the scan to `nprobe/nlist` of
    * the table, the survivors are scored in the COMPRESSED domain (one
    * `AdcExpr` table lookup per code row — the float vectors stay
    * unread), and only the `candidateFactor×k` best ADC candidates pay
    * an exact distance. This is the 100 TB read-path shape:
    * cell-partitioned storage turns the probe filter into partition
    * pruning, the code column is ~32× smaller than the vectors, and the
    * exact re-rank touches O(k) rows. */
  /** The persisted IVF-PQ index artifact: every row with its coarse cell
    * and PQ code. `assign` + `quantize` are BUILD-time work — run once,
    * checkpoint/persist, and pass to the search verbs via `coded0`
    * (recomputing codes per query would put the codebook scoring back
    * on the read path). */
  def codedTable(ivf: IvfModel, pq: PqModel, vectors: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    ProductQuantization.quantize(pq, assign(ivf, vectors, vecCol), vecCol)
      .select(col(idCol), col(vecCol), col("cluster"), col("codes"))

  def searchPq(ivf: IvfModel, pq: PqModel, vectors: DataFrame,
      idCol: String, vecCol: String, query: Array[Float], k: Int,
      nprobe: Int = 4, metric: String = "euclidean",
      candidateFactor: Int = 10, coded0: Option[DataFrame] = None): DataFrame = {
    if (pq.numSubVectors == 0)
      return search(ivf, vectors, idCol, vecCol, query, k, nprobe, metric)
    val probeSet = ivf.probes(query, nprobe)
    val tables = pq.adcTables(query)
    coded0.getOrElse(codedTable(ivf, pq, vectors, idCol, vecCol))
      .filter(col("cluster").isin(probeSet: _*))
      .withColumn("adc", graft.functions.AdcExpr(col("codes"), tables))
      .orderBy(col("adc"), col(idCol))
      .limit(math.max(k, candidateFactor * k))
      .withColumn("dist", round(Distances.metric(metric)(col(vecCol), typedLit(query)), 6))
      .select(col(idCol), col("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Batch IVF-ADC — [[searchPq]]'s multi-query form. Probe selection
    * and the (query, cluster)-pair broadcast join are [[searchBatch]]'s;
    * the difference is the scoring of each collision: every query's
    * 256-entry-per-block ADC tables are computed ONCE on the broadcast
    * side (a per-row HOF over the codebook literals — |Q|·nprobe rows,
    * never data), and each probed row then costs `numSubVectors` table
    * lookups over its 8-byte code instead of a full-width float fold.
    * The per-query `candidateFactor×k` ADC pool (bounded-heap partial
    * aggregate) re-ranks exactly, so the output matches the exact probe
    * replay whenever the pool contains the true top-k — the property
    * the oracle pins. */
  def searchPqBatch(ivf: IvfModel, pq: PqModel, vectors: DataFrame,
      idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nprobe: Int = 4, metric: String = "euclidean",
      candidateFactor: Int = 10, coded0: Option[DataFrame] = None): DataFrame = {
    if (pq.numSubVectors == 0)
      return searchBatch(ivf, vectors, idCol, vecCol,
        queries, queryIdCol, queryVecCol, k, nprobe, metric)
    import org.apache.spark.sql.expressions.Window
    val centersLit = typedLit(ivf.centers.map(_.toSeq).toSeq)
    val probes = queries
      .select(col(queryIdCol), col(queryVecCol))
      .select(col(queryIdCol), col(queryVecCol),
        posexplode(centersLit).as(Seq("_cid", "_cv")))
      .withColumn("_cd", Distances.euclidean(col(queryVecCol), col("_cv")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("_cd"), col("_cid"))))
      .filter(col("_rn") <= nprobe)
      .select(col(queryIdCol), col(queryVecCol).as("_qv"), col("_cid").as("cluster"))
    // per-query ADC tables: tables[b][c] = ‖q_block_b − centroid_{b,c}‖²
    val subDim = pq.subDim
    val pqCentsLit = typedLit(
      pq.models.map(_.clusterCenters.map(_.toArray.toSeq).toSeq).toSeq)
    val probesT = probes.withColumn("_tables",
      transform(pqCentsLit, (blockCents, b) =>
        transform(blockCents, cv =>
          aggregate(
            zip_with(slice(col("_qv"), b * lit(subDim) + lit(1), lit(subDim)), cv,
              (x, y) => { val d = x.cast("double") - y; d * d }),
            lit(0.0), (acc, v) => acc + v))))
    // the (cluster, codes) table is the build-time artifact; the probe
    // join reads only colliding cells of it
    val coded = coded0.getOrElse(codedTable(ivf, pq, vectors, idCol, vecCol))
    val scored = coded.select(col(idCol), col("cluster"), col("codes"))
      .join(broadcast(probesT), "cluster")
      .withColumn("dist", graft.functions.AdcLookupExpr(col("codes"), col("_tables")))
    val pool = graft.ops.Knn.batchOver(scored, idCol, queryIdCol,
      math.max(k, candidateFactor * k))
    // exact re-rank of the bounded pool: candidate ids broadcast back to
    // the table; query vectors re-attach by query id
    val rescored = vectors.select(col(idCol), col(vecCol))
      .join(broadcast(pool.select(col(queryIdCol), col(idCol))), idCol)
      .join(broadcast(queries.select(col(queryIdCol), col(queryVecCol).as("_qv"))),
        queryIdCol)
      .withColumn("dist", round(Distances.metric(metric)(col(vecCol), col("_qv")), 6))
    graft.ops.Knn.batchOver(rescored, idCol, queryIdCol, k)
  }

  /** Batch probe-limited kNN — the multi-query scale path. Each query
    * ranks the `nlist`-row centroid table (exploded per query — tiny) and
    * keeps its `nprobe` nearest clusters; the (query, cluster) probe
    * pairs broadcast-join the cluster-assigned table, so a vector is
    * scored ONLY against queries probing its cluster — the work is
    * O(data × nprobe/nlist × |Q|-collisions), never the full cross
    * product — and the per-query top-k runs as the bounded-heap partial
    * aggregate (shuffle O(|Q| × k)). Probe ranking is euclidean with ties
    * to the lower centroid id, identical to [[IvfModel.probes]]. Returns
    * (query_id, rank BIGINT, id, dist). */
  def searchBatch(model: IvfModel, vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nprobe: Int = 4, metric: String = "euclidean"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centersLit = typedLit(model.centers.map(_.toSeq).toSeq)
    val probes = queries
      .select(col(queryIdCol), col(queryVecCol))
      .select(col(queryIdCol), col(queryVecCol),
        posexplode(centersLit).as(Seq("_cid", "_cv")))
      .withColumn("_cd", Distances.euclidean(col(queryVecCol), col("_cv")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(queryIdCol)).orderBy(col("_cd"), col("_cid"))))
      .filter(col("_rn") <= nprobe)
      .select(col(queryIdCol), col(queryVecCol).as("_qv"), col("_cid").as("cluster"))
    val scored = assign(model, vectors, vecCol)
      .join(broadcast(probes), "cluster")
      .withColumn("dist", round(Distances.metric(metric)(col(vecCol), col("_qv")), 6))
    graft.ops.Knn.batchOver(scored, idCol, queryIdCol, k)
  }
}
