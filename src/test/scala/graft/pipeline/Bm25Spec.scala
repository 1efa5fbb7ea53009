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
}
