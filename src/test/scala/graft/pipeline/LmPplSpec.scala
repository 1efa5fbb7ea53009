package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LmPplSpec extends SparkSpec {
  import sqlImplicits._

  // seed rows define the target LM; off-seed rows reuse either seed
  // bigrams (fluent) or novel ones (disfluent)
  private val corpus = Seq(
    (0L, "spark stream window batch merge", true),
    (1L, "spark stream window batch join", true),
    (2L, "spark stream window merge join", true),
    (3L, "spark stream window batch merge", false), // pure seed bigrams
    (4L, "zebra quark lemon violet crumb", false),  // zero seed bigrams
    (5L, "spark stream zebra quark lemon", false)   // mixed
  ).toDF("doc_id", "text", "is_seed")

  test("documents made of seed bigrams score lower log-ppl than novel ones") {
    val (num, den) = LmPpl.bigramLogTables(corpus, "text", col("is_seed"), 256)
    val s = LmPpl.logPpl(corpus, "doc_id", "text", num, den)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(3L) < s(4L), s"seed-like ${s(3L)} should beat novel ${s(4L)}")
    assert(s(3L) < s(5L) && s(5L) < s(4L),
      s"mixed doc should land between: ${s(3L)} < ${s(5L)} < ${s(4L)}")
  }

  test("short documents (fewer than two tokens) score exactly 0") {
    val docs = Seq((1L, "one"), (2L, ""), (3L, "two words")).toDF("doc_id", "text")
    val (num, den) = LmPpl.bigramLogTables(corpus, "text", col("is_seed"), 256)
    val s = LmPpl.logPpl(docs, "doc_id", "text", num, den)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) == 0.0 && s(2L) == 0.0 && s(3L) != 0.0)
  }

  test("scores are exact integer micro-nat sums: invariant under repartition") {
    val a = LmPpl.pplBuckets(corpus, "doc_id", "text", col("is_seed"), 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sortBy(_._1)
    val b = LmPpl.pplBuckets(corpus.repartition(5), "doc_id", "text", col("is_seed"), 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("BigramPplExpr kernel equals the replaced HOF column formulation (r15)") {
    // the r14 shape: token array materialized behind a projection, then
    // aggregate() HOF sums over bigrams / context tokens — pinned here
    // as the reference the codegen kernel must match bit-for-bit
    def oldLogPpl(df: org.apache.spark.sql.DataFrame,
        numMicro: Array[Long], denMicro: Array[Long]) = {
      val b = numMicro.length
      val numLit = array(numMicro.map(lit(_)): _*)
      val denLit = array(denMicro.map(lit(_)): _*)
      val nTok = greatest(size(col("_tks")) - 1, lit(0))
      val numSum = aggregate(LmPpl.bigrams(col("_tks")), lit(0L),
        (acc, g) => acc + element_at(numLit, (Dsir.bucket(g, b) + 1L).cast("int")))
      val denSum = aggregate(slice(col("_tks"), lit(1), nTok), lit(0L),
        (acc, t) => acc + element_at(denLit, (Dsir.bucket(t, b) + 1L).cast("int")))
      df.select(col("doc_id"), Dedup.tokens(col("text")).as("_tks"))
        .select(col("doc_id"), nTok.as("_n"), (numSum - denSum).as("_micro"))
        .select(col("doc_id"),
          when(col("_n") < 1, lit(0.0))
            .otherwise(floor(-col("_micro").cast("double")
              / col("_n").cast("double") + 0.5) / 1e6)
            .as("log_ppl"))
    }
    val edge = Seq(
      (0L, "spark stream window batch merge"),
      (1L, "  leading and\ttab\nnewline vt\ffeed\rcr  spaced  "),
      (2L, "MIXED Case TOKENS Mixed case tokens"),
      (3L, "unicode élan ünïcode 中文 分词 étoile élan"),
      (4L, "emoji 😀 pair 𝔘𝔫𝔦 surrogate 😀 emoji"),
      (5L, ""), (6L, "one"), (7L, "one two"), (8L, null.asInstanceOf[String]),
      (9L, "repeat repeat repeat repeat repeat"))
      .toDF("doc_id", "text")
    val (num, den) = LmPpl.bigramLogTables(corpus, "text", col("is_seed"), 256)
    val kernel = LmPpl.logPpl(edge, "doc_id", "text", num, den)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = oldLogPpl(edge, num, den)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kernel == ref, s"kernel $kernel != reference $ref")
  }

  test("tertile buckets cover all docs and follow score order") {
    val out = LmPpl.pplBuckets(corpus, "doc_id", "text", col("is_seed"), 256)
      .collect().map(r => (r.getDouble(1), r.getString(2)))
    assert(out.length == 6)
    val byBucket = out.groupBy(_._2)
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    // ordering property: every head score <= every middle <= every tail
    def maxOf(b: String) = byBucket.getOrElse(b, Array.empty).map(_._1).maxOption
    def minOf(b: String) = byBucket.getOrElse(b, Array.empty).map(_._1).minOption
    for (h <- maxOf("head"); m <- minOf("middle")) assert(h <= m)
    for (m <- maxOf("middle"); t <- minOf("tail")) assert(m <= t)
  }
}
