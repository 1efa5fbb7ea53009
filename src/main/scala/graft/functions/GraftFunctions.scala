package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.bridge

/** SQL registration of the codegen kernels, so `spark.sql("...")` users
  * get the same distance library as the DataFrame API (the reference's
  * IDistanceCalculator registry, reachable from SQL):
  *
  *   SELECT graft_euclidean(a.embedding, b.embedding) FROM ...
  *
  * Two entry points, same function set:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the cluster-wide injection path, SparkSessionExtensions);
  *  - `GraftFunctions.register(spark)` on a live session.
  */
object GraftFunctions {

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_euclidean" -> (c => DistanceExpr(c(0), c(1), DistanceKernel.Euclidean)),
    "graft_cosine_similarity" -> (c => DistanceExpr(c(0), c(1), DistanceKernel.CosineSimilarity)),
    "graft_manhattan" -> (c => DistanceExpr(c(0), c(1), DistanceKernel.Manhattan)),
    "graft_chebyshev" -> (c => DistanceExpr(c(0), c(1), DistanceKernel.Chebyshev)),
    "graft_minkowski3" -> (c => DistanceExpr(c(0), c(1), DistanceKernel.Minkowski3)),
    "graft_dot" -> (c => DistanceExpr(c(0), c(1), DistanceKernel.Dot)),
    "graft_magnitude" -> (c => MagnitudeExpr(c(0))),
    "graft_hamming_packed" -> (c => HammingPackedExpr(c(0), c(1))),
    "graft_simhash" -> (c => SimHashExpr(c(0))))

  /** Register every kernel as a temp SQL function on `spark`. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => bridge.registerFunction(spark, name, b) }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      bridge.injectFunction(ext, name, b)
    }
}
