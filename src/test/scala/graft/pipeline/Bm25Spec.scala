package graft.pipeline

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import sqlImplicits._

  // corpus: doc 1 has "vector" twice (len 4), doc 2 one of each (len 2),
  // doc 3 matches nothing (len 3)
  private lazy val docs = Seq(
    (1L, "a b vector vector"),
    (2L, "vector hash"),
    (3L, "b c d")).toDF("doc_id", "text")

  /** Independent scalar mirror of the formula (plain Scala math). */
  private def expected(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = BigDecimal(math.log(1.0 + (n.toDouble - df + 0.5) / (df + 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
  }

  test("scores match a hand-computed BM25 (tf, idf, length normalization)") {
    val got = Bm25.score(docs, "doc_id", "text", Seq("vector", "hash"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val avgdl = (4 + 2 + 3) / 3.0
    // doc 3 matches no terms → absent
    assert(got.keySet === Set(1L, 2L))
    val e1 = expected(tf = 2, dl = 4, df = 2, n = 3, avgdl = avgdl)
    val e2 = expected(tf = 1, dl = 2, df = 2, n = 3, avgdl = avgdl) + // vector
      expected(tf = 1, dl = 2, df = 1, n = 3, avgdl = avgdl)          // hash (rarer → higher idf)
    assert(math.abs(got(1L) - BigDecimal(e1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    assert(math.abs(got(2L) - BigDecimal(e2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    // the doc hitting the rarer term outranks the long tf-heavy one
    assert(got(2L) > got(1L))
  }

  test("topK orders by (score desc, id) and bounds the result") {
    val top = Bm25.topK(docs, "doc_id", "text", Seq("vector", "hash"), k = 1).collect()
    assert(top.length === 1 && top.head.getLong(0) === 2L)
  }

  test("tfIdfTopK: exact integer micro-nat scores, per-doc rank, ubiquitous terms score 0") {
    val out = Bm25.tfIdfTopK(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // 'b' (docs 1,3) and 'vector' (docs 1,2) have df=2:
    // idf_micro = floor(ln(3/2)*1e6+0.5); df=1 terms get ln(3)
    val idfB = math.floor(math.log(3.0 / 2.0) * 1e6 + 0.5).toLong
    val idf1 = math.floor(math.log(3.0) * 1e6 + 0.5).toLong
    // doc 1 top-2: a (df=1, score idf1=1098612) then vector
    // (tf=2, score 2*idfB=810930); b (405465) drops out
    assert(out((1L, "a")) === ((1L, idf1, 1L)))
    assert(out((1L, "vector")) === ((2L, 2 * idfB, 2L)))
    assert(!out.contains((1L, "b")))
    // doc 2: hash df=1 outranks vector df=2
    assert(out((2L, "hash"))._3 === 1L && out((2L, "vector"))._3 === 2L)
    // doc 3: c and d (df=1, idf1) tie and outrank b (idfB); term asc
    assert(out((3L, "c"))._3 === 1L && out((3L, "d"))._3 === 2L)
    assert(!out.contains((3L, "b")))
    assert(idfB < idf1)
  }
}
