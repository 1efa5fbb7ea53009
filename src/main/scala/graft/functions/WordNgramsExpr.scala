package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-n-gram STRING production: lowercase, split on whitespace
  * runs, join each n consecutive tokens with a single space. Semantically
  * identical to the HOF chain
  * `transform(sequence(...), i => concat_ws(" ", slice(tokens, i, n)))`
  * over [[graft.pipeline.Dedup.tokens]] — but that chain's per-element
  * lambdas are interpreted (higher-order functions don't participate in
  * whole-stage codegen) and each gram pays a fresh array slice plus a
  * concat, ~19 µs/gram measured; this kernel is one shared static routine
  * (~100 ns/gram) called from both the interpreted and generated paths.
  *
  * Duplicates are kept: corpus frequency counting needs every occurrence
  * (the distinct-shingle variant for Jaccard is [[graft.pipeline.Dedup.shingles]]).
  *
  * Tokenization contract (must stay replayable by a SQL oracle):
  * `lower()` is `UTF8String.toLowerCase` — exactly Spark's `lower` — and
  * the separator set is Java regex `\s` = `[ \t\n\x0B\f\r]` (vertical
  * tab INCLUDED), exactly `split(text, "\\s+")` with empty tokens
  * dropped. NOTE: RE2's `\s` (DuckDB) LACKS `\x0B`, so SQL replays must
  * spell the class out explicitly — `'[ \t\n\x0b\f\r]+'` — never `'\s+'`.
  */
object WordNgrams {
  private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String, n: Int): Array[UTF8String] = {
    val s = if (text == null) "" else text.toLowerCase.toString
    // token spans [start, end) over the lowercased text
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var tokenStart = -1
    while (i < s.length) {
      if (isSep(s.charAt(i))) {
        if (tokenStart >= 0) { starts.add(tokenStart); ends.add(i); tokenStart = -1 }
      } else if (tokenStart < 0) tokenStart = i
      i += 1
    }
    if (tokenStart >= 0) { starts.add(tokenStart); ends.add(s.length) }
    val t = starts.size()
    if (t < n) return Array.empty[UTF8String]
    val out = new Array[UTF8String](t - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= t - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(s, starts.get(j + k), ends.get(j + k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    out
  }
}

case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires n >= 1, got $n")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires STRING input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override protected def withNewChildInternal(c: Expression): WordNgramsExpr = copy(child = c)

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      WordNgrams.compute(a.asInstanceOf[UTF8String], n).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.WordNgrams.compute($a, $n));""".stripMargin)
}

object WordNgramsExpr {
  def apply(text: Column, n: Int): Column = {
    require(n >= 1, s"word_ngrams requires n >= 1, got $n")
    bridge.column(WordNgramsExpr(bridge.expression(text), n))
  }
}
