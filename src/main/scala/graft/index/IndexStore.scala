package graft.index

import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.sql.SparkSession

/** Index-artifact persistence (SURVEY §2.1 "Index persistence": the
  * reference serializes search indexes into its V1 snapshot,
  * Neighborly/Search/SearchService.cs:285-342). Spark-native form: MLlib
  * model dirs + a small parquet of parameters; tree structures are never
  * serialized — LSH projections regenerate from (dim, tables, funcs, seed)
  * and exact search needs no artifact, mirroring the reference's choice to
  * persist only what cannot be re-derived cheaply.
  */
object IndexStore {

  def saveLsh(spark: SparkSession, params: LshParams, path: String): Unit = {
    import spark.implicits._
    Seq((params.dim, params.tableCount, params.hashFunctionCount, params.seed))
      .toDF("dim", "table_count", "hash_function_count", "seed")
      .write.mode("overwrite").parquet(s"$path/lsh_params")
  }

  def loadLsh(spark: SparkSession, path: String): LshParams = {
    val r = spark.read.parquet(s"$path/lsh_params").head()
    LshParams(r.getAs[Int]("dim"), r.getAs[Int]("table_count"),
      r.getAs[Int]("hash_function_count"), r.getAs[Int]("seed"))
  }

  def saveBqThreshold(spark: SparkSession, threshold: Double, path: String): Unit = {
    import spark.implicits._
    Seq(threshold).toDF("threshold").write.mode("overwrite").parquet(s"$path/bq_threshold")
  }

  def loadBqThreshold(spark: SparkSession, path: String): Double =
    spark.read.parquet(s"$path/bq_threshold").head().getAs[Double]("threshold")

  /** IVF coarse centroids as a tiny parquet (cid, center) — the raw-center
    * model needs no MLlib machinery to restore. */
  def saveIvf(spark: SparkSession, model: IvfModel, path: String): Unit = {
    import spark.implicits._
    model.centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "center")
      .write.mode("overwrite").parquet(s"$path/ivf_centers")
  }

  def loadIvf(spark: SparkSession, path: String): IvfModel = {
    val centers = spark.read.parquet(s"$path/ivf_centers")
      .orderBy("cid").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("center").toArray)
    IvfModel(centers)
  }

  def savePq(spark: SparkSession, model: PqModel, path: String): Unit = {
    import spark.implicits._
    Seq((model.numSubVectors, model.subDim)).toDF("num_sub_vectors", "sub_dim")
      .write.mode("overwrite").parquet(s"$path/pq_meta")
    model.models.zipWithIndex.foreach { case (km, b) =>
      km.write.overwrite().save(s"$path/pq_block_$b")
    }
  }

  def loadPq(spark: SparkSession, path: String): PqModel = {
    val meta = spark.read.parquet(s"$path/pq_meta").head()
    val m = meta.getAs[Int]("num_sub_vectors")
    val models = (0 until m).map(b => KMeansModel.load(s"$path/pq_block_$b")).toArray
    PqModel(models, meta.getAs[Int]("sub_dim"))
  }
}
