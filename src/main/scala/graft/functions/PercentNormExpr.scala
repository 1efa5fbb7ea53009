package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2.2.1–2 percent-encoding normalization, one linear pass:
  *
  *  - a triplet `%XY` (X, Y hex) that encodes an UNRESERVED character
  *    (ALPHA / DIGIT / `-` / `.` / `_` / `~`) decodes to that character
  *    — `%61` → `a`, `%7E` → `~`;
  *  - any other valid triplet keeps its encoding with UPPERCASE hex —
  *    `%2f` → `%2F` (reserved and non-ASCII octets must stay encoded,
  *    but hex case is not identity);
  *  - a `%` not followed by two hex digits is copied verbatim (not a
  *    triplet — real crawl noise contains bare percents).
  *
  * Because decoding only ever produces unreserved ASCII, no pass can
  * create a new `%` or a new triplet — one scan is a fixed point, and a
  * DuckDB oracle replays it as a finite chain of regexp_replace calls
  * (66 case-insensitive decodes + 12 hex-uppercase rewrites; see
  * `UrlQueries`). ASCII-only byte logic, so the scan is UTF-8 safe.
  */
object PercentNorm {
  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  private val HEX = "0123456789ABCDEF"

  def normalize(in: UTF8String): UTF8String = {
    val s = in.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) out.append(v.toChar)
        else {
          out.append('%').append(HEX.charAt(v >> 4)).append(HEX.charAt(v & 15))
        }
        i += 3
      } else {
        out.append(c)
        i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }
}

case class PercentNormExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"percent_norm requires STRING input, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "percent_norm"
  override protected def withNewChildInternal(c: Expression): PercentNormExpr =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    PercentNorm.normalize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PercentNorm.normalize($a);")
}

object PercentNormExpr {
  def apply(s: Column): Column =
    bridge.column(PercentNormExpr(bridge.expression(s)))
}
