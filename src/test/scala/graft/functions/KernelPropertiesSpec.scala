package graft.functions

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
/** Property checks for the index/pipeline kernels (pack, Hamming, MinHash,
  * SimHash, shingles) over seeded random cases — invariants a refactor
  * must not break. */
class KernelPropertiesSpec extends SparkSpec {
  import sqlImplicits._

  private val rnd = new scala.util.Random(42)
  private def floatArr(): Array[Float] =
    Array.fill(1 + rnd.nextInt(130))(rnd.nextFloat() * 20f - 10f)

  test("packLocal: popcount equals count of components >= threshold") {
    for (_ <- 1 to 60) {
      val v = floatArr(); val t = rnd.nextDouble() * 10 - 5
      val packed = PackBitsExpr.packLocal(v, t)
      val pop = packed.map(java.lang.Long.bitCount).sum
      assert(pop === v.count(_.toDouble >= t))
      assert(packed.length === (v.length + 63) / 64)
    }
  }

  test("hamming(pack(a), pack(a)) == 0; hamming is symmetric and bounded by dim") {
    for (_ <- 1 to 10) {
      val v = floatArr()
      val p = PackBitsExpr.packLocal(v, 0.0)
      val flipped = PackBitsExpr.packLocal(v.map(-_), 0.0)
      val df = Seq((p, p, flipped)).toDF("a", "b", "c")
      val r = df.select(
        Distances.hammingPacked($"a", $"b"),
        Distances.hammingPacked($"a", $"c"),
        Distances.hammingPacked($"c", $"a")).head()
      assert(r.getLong(0) === 0L)
      assert(r.getLong(1) === r.getLong(2))
      assert(r.getLong(1) <= v.length.toLong)
    }
  }

  test("ShingleHash: count is tokens-n+1, stable, and whitespace-normalization-invariant") {
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = Seq("alpha", "beta", "gamma", "delta", "Zeta")
    for (_ <- 1 to 40) {
      val ws = Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
      val text = ws.mkString(" ")
      val h1 = ShingleHash.compute(UTF8String.fromString(text), 3)
      val h2 = ShingleHash.compute(UTF8String.fromString("  " + ws.mkString("\t") + " \n"), 3)
      assert(h1.length === math.max(ws.length - 2, 0))
      assert(h1.toSeq === h2.toSeq, "hash must ignore whitespace shape")
      val upper = ShingleHash.compute(UTF8String.fromString(text.toUpperCase), 3)
      assert(h1.toSeq === upper.toSeq, "hash must be case-insensitive")
    }
  }

  test("MinHash signatures: equal shingle sets give equal signatures; permutation-invariant") {
    val base = Seq("a b c d e f g h i j")
    val perm = Seq("f g h i j a b c d e") // different shingles — differs
    val df = (base ++ base ++ perm).zipWithIndex.map(_.swap).toDF("id", "t")
      .select($"id", Dedup.minHashSignature(ShingleHashExpr($"t", 2), 32).as("sig"))
    val sigs = df.orderBy("id").collect().map(_.getSeq[Long](1))
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2))
  }

  test("SimHash: single-token text hashes to that token's bit pattern direction") {
    // with one token every counter is +1/-1 exactly per the token hash bits
    val df = Seq(Tuple1("lonely")).toDF("t")
    val sh = df.select(Dedup.simHash($"t")).head().getLong(0)
    val tok = df.select(element_at(transform(Dedup.tokens($"t"), w => xxhash64(w)), 1)).head().getLong(0)
    assert(sh === tok)
  }

  test("jaccard is 1 for identical shingle sets, 0 for disjoint, monotone under overlap") {
    val df = Seq(
      ("a b c d", "a b c d"),
      ("a b c d", "x y z w"),
      ("a b c d e", "c d e f g")).toDF("x", "y")
      .select(Dedup.jaccard(Dedup.shingles($"x", 2), Dedup.shingles($"y", 2)).as("j"))
    val js = df.collect().map(_.getDouble(0))
    assert(js(0) === 1.0)
    assert(js(1) === 0.0)
    assert(js(2) > 0.0 && js(2) < 1.0)
  }

  test("AdcLookupExpr (column tables) is bit-identical to AdcExpr (literal tables)") {
    // the single-query and batch IVF-ADC paths score through two codegen
    // kernels; same (codes, tables) must yield the same double, bit for bit
    val rnd = new scala.util.Random(33)
    val m = 4; val codebook = 16
    val tables = Array.fill(m, codebook)(rnd.nextDouble() * 10)
    val rows = (1 to 50).map(i => (i.toLong, Seq.fill(m)(rnd.nextInt(codebook))))
    val df = rows.toDF("id", "codes")
    val tablesLit = typedLit(tables.map(_.toSeq).toSeq)
    val out = df.select(
        col("id"),
        graft.functions.AdcExpr(col("codes"), tables).as("lit_adc"),
        graft.functions.AdcLookupExpr(col("codes"), tablesLit).as("col_adc"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"kernels diverged for id ${r.getLong(0)}")
    }
    assert(out.length === 50)
  }

  test("NearestCentroidExpr matches a driver replay: micro freeze, argmin, lower-id ties") {
    def micro(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong
    for (_ <- 1 to 20) {
      val dim = 1 + rnd.nextInt(40)
      val centers = Array.fill(1 + rnd.nextInt(6))(
        Array.fill(dim)(micro(rnd.nextFloat() * 4f - 2f)))
      val vecs = Seq.fill(15)(Array.fill(dim)(rnd.nextFloat() * 4f - 2f))
      val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
        .select($"id", NearestCentroidExpr($"v", centers).as("nc"))
        .collect().map(r => r.getLong(0) ->
          ((r.getStruct(1).getInt(0), r.getStruct(1).getLong(1)))).toMap
      for ((v, i) <- vecs.zipWithIndex) {
        val d2s = centers.map(c => v.indices.map(j => {
          val d = micro(v(j)) - c(j); d * d
        }).sum)
        val best = d2s.indices.minBy(k => (d2s(k), k))
        assert(got(i.toLong) === ((best, d2s(best))), s"vec $i")
      }
    }
  }

  test("CentroidDist2Expr matches the driver residual, including a missing label -> -1") {
    def micro(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong
    for (_ <- 1 to 20) {
      val dim = 1 + rnd.nextInt(40)
      val labels = Seq(3, 7, 11)
      val cents: Map[Int, Seq[Long]] =
        labels.map(l => l -> Seq.fill(dim)(micro(rnd.nextFloat() * 4f - 2f))).toMap
      val rows = Seq.fill(12)((labels :+ 99)(rnd.nextInt(4)))
        .zipWithIndex.map { case (l, i) =>
          (i.toLong, Array.fill(dim)(rnd.nextFloat() * 4f - 2f), l)
        }
      val got = rows.toDF("id", "v", "l")
        .select($"id", CentroidDist2Expr($"v", $"l", cents).as("d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (id, v, l) =>
        val want = cents.get(l).map(c =>
          v.indices.map(j => { val d = micro(v(j)) - c(j); d * d }).sum).getOrElse(-1L)
        assert(got(id) === want, s"row $id label $l")
      }
    }
  }
}
