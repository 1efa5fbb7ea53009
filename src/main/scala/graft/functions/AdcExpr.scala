package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric Distance Computation for Product Quantization
  * (ProductQuantization.cs:330-379): the query's per-block distance² to
  * every centroid is precomputed driver-side into `tables[block][code]`;
  * each row's approximate distance is then
  * `sqrt(Σ_b tables[b][codes[b]])` — a table lookup per block, no float
  * math over the original vector. Codegen kernel with the lookup tables as
  * a reference object.
  */
case class AdcExpr(child: Expression, tables: Array[Array[Double]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"adc_dist requires ARRAY<INT> codes, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_dist"
  override protected def withNewChildInternal(c: Expression): AdcExpr = copy(child = c)

  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), tables.length)
    var s = 0.0; var b = 0
    while (b < m) { s += tables(b)(codes.getInt(b)); b += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tab = ctx.addReferenceObj("adcTables", tables, "double[][]")
      val b = ctx.freshName("b"); val m = ctx.freshName("m"); val s = ctx.freshName("s")
      s"""int $m = java.lang.Math.min($a.numElements(), $tab.length);
         |double $s = 0.0;
         |for (int $b = 0; $b < $m; $b++) {
         |  $s += $tab[$b][$a.getInt($b)];
         |}
         |${ev.value} = java.lang.Math.sqrt($s);""".stripMargin
    })
}

object AdcExpr {
  def apply(codes: Column, tables: Array[Array[Double]]): Column =
    bridge.column(AdcExpr(bridge.expression(codes), tables))
}

/** Row-level ADC: like [[AdcExpr]] but the lookup tables arrive as a
  * COLUMN (`ARRAY<ARRAY<DOUBLE>>`, one tables value per row) — the
  * BATCH path computes each query's tables once on the broadcast side,
  * so every (query, code-row) bucket collision is scored with pure
  * table lookups, never the original floats. */
case class AdcLookupExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_lookup requires (ARRAY<INT> codes, ARRAY<ARRAY<DOUBLE>> tables), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcLookupExpr =
    copy(left = l, right = r)

  override def nullSafeEval(c: Any, t: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val tables = t.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), tables.numElements())
    var s = 0.0; var b = 0
    while (b < m) { s += tables.getArray(b).getDouble(codes.getInt(b)); b += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val b = ctx.freshName("b"); val m = ctx.freshName("m"); val s = ctx.freshName("s")
      s"""int $m = java.lang.Math.min($c.numElements(), $t.numElements());
         |double $s = 0.0;
         |for (int $b = 0; $b < $m; $b++) {
         |  $s += $t.getArray($b).getDouble($c.getInt($b));
         |}
         |${ev.value} = java.lang.Math.sqrt($s);""".stripMargin
    })
}

object AdcLookupExpr {
  def apply(codes: Column, tables: Column): Column =
    bridge.column(AdcLookupExpr(bridge.expression(codes), bridge.expression(tables)))
}
