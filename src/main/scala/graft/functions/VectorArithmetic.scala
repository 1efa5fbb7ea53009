package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Element-wise vector arithmetic (reference: Vector.cs:209-319 operator
  * overloads add/subtract/divide). Elements are widened to double before
  * the op — float32 values are exactly representable in double, so results
  * are deterministic and identical across engines.
  */
object VectorArithmetic {
  def add(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") + y.cast("double"))

  def subtract(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") - y.cast("double"))

  /** Divide by scalar (Vector.cs divide overload). */
  def divide(a: Column, k: Double): Column =
    transform(a, x => x.cast("double") / lit(k))
}
