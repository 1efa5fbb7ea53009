package graft.index

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * coarse-quantizer scale path for embedding search (build-brief
  * extension; the reference has no IVF, its ANN family is LSH/BQ/PQ).
  *
  * fit: k-means coarse centroids (seed 42, single coalesced partition for
  * cross-session determinism — sample-based training is standard at
  * scale). assign: nearest-centroid cluster id per row — the partition
  * key you'd bucket/partition the table by at 100 TB, so a probe scans
  * only `nprobe/nlist` of the data. search: pick the `nprobe` nearest
  * centroids driver-side, scan only those clusters, exact top-k.
  */
final case class IvfModel(km: KMeansModel) {
  def nlist: Int = km.clusterCenters.length

  /** Nearest `nprobe` centroid ids to the query, by euclidean. */
  def probes(query: Array[Float], nprobe: Int): Seq[Int] =
    km.clusterCenters.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var j = 0
      while (j < math.min(query.length, c.size)) {
        val d = query(j).toDouble - c(j); s += d * d; j += 1
      }
      (s, i)
    }.sortBy(p => (p._1, p._2)).take(nprobe).map(_._2).toSeq
}

object Ivf {

  private def features(vecCol: String) = array_to_vector(col(vecCol)).as("_ivf_f")

  def fit(vectors: DataFrame, vecCol: String, nlist: Int = 16, seed: Long = 42,
      maxIter: Int = 20): IvfModel = {
    val n = vectors.count()
    val k = math.min(nlist.toLong, n).toInt
    val train = vectors.select(features(vecCol)).coalesce(1).cache()
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("_ivf_f").setPredictionCol("_ivf_c").fit(train)
    train.unpersist()
    IvfModel(km)
  }

  /** Append the coarse cluster id (the IVF partition key). */
  def assign(model: IvfModel, vectors: DataFrame, vecCol: String,
      outCol: String = "cluster"): DataFrame = {
    val withF = vectors.withColumn("_ivf_f", array_to_vector(col(vecCol)))
    model.km.setPredictionCol("_ivf_c").transform(withF)
      .withColumn(outCol, col("_ivf_c")).drop("_ivf_f", "_ivf_c")
  }

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
}
