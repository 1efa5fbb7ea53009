package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature from pre-hashed shingles, one codegen pass.
  *
  * Each shingle is string-hashed ONCE upstream (xxhash64); the `numHashes`
  * signature lanes come from a splitmix64 finalizer over (shingleHash +
  * lane·φ64) — an independent-enough hash family at a few ALU ops per
  * lane, so the kernel does shingles × lanes integer mixing instead of
  * shingles × lanes string hashing (the difference between 23 s and
  * sub-second on the 5k-doc corpus).
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT> shingle hashes, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < x.numElements()) {
      val h = x.getLong(i)
      var lane = 0
      while (lane < numHashes) {
        var z = h + (lane + 1) * -7046029254386353131L // φ64 = 0x9E3779B97F4A7C15
        z = (z ^ (z >>> 30)) * -4658895280553007687L   // 0xBF58476D1CE4E5B9
        z = (z ^ (z >>> 27)) * -7723592293110705685L   // 0x94D049BB133111EB
        z = z ^ (z >>> 31)
        if (z < sig(lane)) sig(lane) = z
        lane += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val lane = ctx.freshName("lane")
      val h = ctx.freshName("h"); val z = ctx.freshName("z"); val sig = ctx.freshName("sig")
      s"""long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $lane = 0; $lane < $numHashes; $lane++) {
         |    long $z = $h + ($lane + 1) * -7046029254386353131L;
         |    $z = ($z ^ ($z >>> 30)) * -4658895280553007687L;
         |    $z = ($z ^ ($z >>> 27)) * -7723592293110705685L;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $sig[$lane]) $sig[$lane] = $z;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);""".stripMargin
    })
}

object MinHashSigExpr {
  def apply(shingleHashes: Column, numHashes: Int): Column =
    bridge.column(MinHashSigExpr(bridge.expression(shingleHashes), numHashes))
}
