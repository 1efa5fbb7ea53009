package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StructField, StructType}

/** Nearest centroid in MICRO-UNIT integer space: the input float vector
  * freezes element-wise to `⌊x·1e6 + 0.5⌋` and the squared distance to
  * every centroid (already in micro-units) is an exact integer sum —
  * order-free, overflow-safe (|diff| ≲ 8e6 → Σ ≲ 4e15 over 64 dims),
  * and bit-replayable by a SQL oracle. Strict-`<` keeps the LOWER
  * cluster id on exact ties, matching `ORDER BY d2, cl` in the replay.
  * Returns `struct<cluster int, dist2 bigint>` so assignment and
  * residual ride one kernel pass; centroids are a codegen reference
  * object — one tight loop regardless of k (the [[ArgMinDistExpr]]
  * precedent, integer-exact where that one is IEEE-double).
  */
case class NearestCentroidExpr(child: Expression, centers: Array[Array[Long]])
    extends UnaryExpression {
  require(centers.nonEmpty, "need at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires ARRAY<FLOAT>, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("dist2", LongType, nullable = false)))
  override def prettyName: String = "nearest_centroid"
  override protected def withNewChildInternal(c: Expression): NearestCentroidExpr =
    copy(child = c)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n0 = v.numElements()
    val m = new Array[Long](n0)
    var i = 0
    while (i < n0) { m(i) = math.floor(v.getFloat(i).toDouble * 1e6 + 0.5).toLong; i += 1 }
    var best = 0; var bestD = Long.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val n = math.min(n0, ctr.length)
      var s = 0L; var j = 0
      while (j < n) { val d = m(j) - ctr(j); s += d * d; j += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    InternalRow(best, bestD)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cen = ctx.addReferenceObj("kmCenters", centers, "long[][]")
      val n0 = ctx.freshName("n0"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""int $n0 = $a.numElements();
         |long[] $m = new long[$n0];
         |for (int $i = 0; $i < $n0; $i++)
         |  $m[$i] = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1000000.0 + 0.5);
         |int $best = 0; long $bestD = Long.MAX_VALUE;
         |for (int $c = 0; $c < $cen.length; $c++) {
         |  int $n = java.lang.Math.min($n0, $cen[$c].length);
         |  long $s = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $d = $m[$j] - $cen[$c][$j];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $best = $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $best, $bestD });""".stripMargin
    })
}

object NearestCentroidExpr {
  def apply(vec: Column, centers: Array[Array[Long]]): Column =
    bridge.column(NearestCentroidExpr(bridge.expression(vec), centers))
}
