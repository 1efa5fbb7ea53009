package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003; the MOSS algorithm). Build-brief extension (document
  * fingerprinting / rolling hash): hash every k-char gram, slide a
  * window of w consecutive gram hashes, and in each window select the
  * minimum hash — ties broken by the RIGHTMOST position, the paper's
  * rule, so runs of windows reuse one selection. The distinct selected
  * (pos, hash) pairs are the document's fingerprint set, guaranteeing
  * any shared substring of length ≥ k + w − 1 contributes at least one
  * shared fingerprint — the property partial-overlap detection needs.
  *
  * One static routine shared by the interpreted and generated paths
  * (the [[WordNgrams]] pattern): per row it is one pass producing the
  * k-gram MD5s plus an O(n) monotone-deque sliding-window minimum — no
  * per-window rescans, no interpreted higher-order-function chain.
  *
  * Engine-parity contract (replayable by a SQL oracle): grams are
  * CHARACTER substrings `substring(text, i, k)` (1-based, i in
  * [1, len−k+1]); the hash is `md5` of the gram's UTF-8 bytes rendered
  * as lowercase hex — identical in Spark and DuckDB — and "minimum"
  * is lexicographic order of that hex string, which equals unsigned
  * byte order of the digest (each byte maps to two hex chars
  * monotonically). Documents shorter than k yield no fingerprints;
  * documents with fewer than w grams yield exactly one (the rightmost
  * minimal gram over all of them — the paper's "every document with
  * ≥ k chars gets at least one fingerprint" guarantee).
  */
object Winnow {
  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic digest compare ( == hex-string order). */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  def compute(text: UTF8String, k: Int, w: Int): Array[InternalRow] = {
    if (text == null) return Array.empty
    // code-point indexing (not Java chars): SQL `substring`/`length`
    // count code points, so astral-plane text must gram identically
    val cps = text.toString.codePoints().toArray
    val n = cps.length - k + 1 // grams, code-point-indexed
    if (n <= 0) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      digests(i) = md.digest(new String(cps, i, k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      i += 1
    }
    val out = new java.util.ArrayList[InternalRow]()
    // monotone deque of gram indices; values strictly increasing front to
    // back. Popping `>= 0` comparisons from the back makes the surviving
    // front the RIGHTMOST minimum of the window (paper's tie rule).
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var lastSel = -1
    val firstWindowEnd = math.min(w, n) // n < w → one window over all grams
    i = 0
    while (i < n) {
      while (tail > head && cmp(digests(deque(tail - 1)), digests(i)) >= 0) tail -= 1
      deque(tail) = i; tail += 1
      if (i >= firstWindowEnd - 1) {
        while (deque(head) <= i - w) head += 1 // expire left of window
        val sel = deque(head)
        // rightmost-min selections are non-decreasing as the window
        // slides, so repeats are consecutive: dedup against the last
        if (sel != lastSel) {
          out.add(new GenericInternalRow(Array[Any](sel + 1, hex(digests(sel)))))
          lastSel = sel
        }
      }
      i += 1
    }
    out.toArray(new Array[InternalRow](out.size()))
  }
}

case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 1 || w < 1 => TypeCheckResult.TypeCheckFailure(
      s"winnow requires k >= 1 and w >= 1, got k=$k w=$w")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow requires STRING input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("hash", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow"
  override protected def withNewChildInternal(c: Expression): WinnowExpr = copy(child = c)

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      Winnow.compute(a.asInstanceOf[UTF8String], k, w).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.Winnow.compute($a, $k, $w));""".stripMargin)
}

object WinnowExpr {
  def apply(text: Column, k: Int, w: Int): Column = {
    require(k >= 1 && w >= 1, s"winnow requires k >= 1 and w >= 1, got k=$k w=$w")
    bridge.column(WinnowExpr(bridge.expression(text), k, w))
  }
}
