package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distance-metric scalar library — the reference's `IDistanceCalculator`
  * family re-expressed as Spark `Column` builders
  * (reference: the calculators under Neighborly/Distance/; dispatch Vector.cs:194-200).
  *
  * Numerics: every metric widens float32 elements to double and folds
  * left-to-right (`aggregate` evaluates sequentially), so results are
  * deterministic and bit-comparable with a sequential double-precision
  * oracle. The SIMD / cache-aligned variants in the reference
  * (SimdEuclideanDistanceCalculator.cs, CacheOptimizedDistanceCalculators.cs)
  * are performance techniques, not semantics — here whole-stage codegen +
  * JVM auto-vectorization play that role; a codegen `Expression` upgrade
  * lives behind this same API (see graft.functions.DistanceExpr).
  */
object Distances {

  private def d(c: Column): Column = c.cast("double")
  private def sumArr(arr: Column): Column = aggregate(arr, lit(0.0), (s, x) => s + x)

  /** sqrt(Σ(a-b)²) — EuclideanDistanceCalculator.cs:15-26 (default metric). */
  def euclidean(a: Column, b: Column): Column =
    sqrt(sumArr(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y)))))

  /** dot/(|a||b|) — **returns similarity, not distance** (bug-compatible
    * with CosineSimilarityCalculator.cs:8-23: larger = closer, yet callers
    * sort ascending and apply `dist <= threshold` uniformly; SURVEY §2.7).
    * `cosineDistance` below is the opt-in corrected metric.
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (magnitude(a) * magnitude(b))

  /** 1 - cosine similarity — the mathematically-correct distance, offered
    * as an extension beyond the reference surface. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Σ|a-b| — ManhattanDistanceCalculator.cs:8-19 */
  def manhattan(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => abs(d(x) - d(y))))

  /** max|a-b| — ChebyshevDistanceCalculator.cs:8-22 */
  def chebyshev(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(d(x) - d(y))), lit(0.0), (s, x) => greatest(s, x))

  /** (Σ|a-b|³)^(1/3) — p hard-coded to 3 in the reference
    * (MinkowskiDistanceCalculator.cs:8-19). */
  def minkowski3(a: Column, b: Column): Column = {
    val cubes = zip_with(a, b, (x, y) => {
      val ad = abs(d(x) - d(y)); ad * ad * ad
    })
    pow(sumArr(cubes), lit(1.0 / 3.0))
  }

  /** sqrt(Σx²) — Vector.cs:270-273 */
  def magnitude(a: Column): Column =
    sqrt(sumArr(transform(a, x => d(x) * d(x))))

  /** Inner product (building block; LSH/ADC reuse it). */
  def dot(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => d(x) * d(y)))

  /** Hamming distance over sign-bit-packed BIGINT words
    * (BinaryQuantization.cs:30-55: XOR + popcount over ulong[]). */
  def hammingPacked(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (s, x) => s + x)

  /** Registry — the Spark analog of the reference's pluggable
    * `IDistanceCalculator` (IDistanceCalculator.cs:7-17). Metric names
    * match the reference's calculator set. */
  val registry: Map[String, (Column, Column) => Column] = Map(
    "euclidean" -> euclidean _,
    "cosine" -> cosineSimilarity _,
    "cosine_distance" -> cosineDistance _,
    "manhattan" -> manhattan _,
    "chebyshev" -> chebyshev _,
    "minkowski" -> minkowski3 _)

  def metric(name: String): (Column, Column) => Column =
    registry.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"unknown distance metric '$name'; known: ${registry.keys.mkString(", ")}"))
}
