package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Distances, MinHashSigExpr, ShingleHashExpr, SimHashExpr}
import graft.index.{Lsh, LshParams}

/** Deduplication operators for large-scale training-data pipelines —
  * beyond the reference surface (the reference's only dedup is the
  * values-equality `.Distinct()` of search results, Vector.cs:419-435);
  * built here as first-class 100 TB operators per the build brief.
  *
  * Scale discipline: every near-dup path is BUCKETED — candidates come
  * from an equi-join on a hash bucket (MinHash band, SimHash word, LSH
  * code), never an all-pairs product. The verify step touches only
  * candidate pairs.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups: one row per distinct content hash with the
    * representative (minimum) id and the duplicate count. Shuffle is one
    * hash-partitioned aggregate. */
  def exactGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol).cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Rows surviving exact dedup (the representative per content hash). */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.join(
      exactGroups(df, idCol, contentCol).select(col("keep_id").as(idCol)),
      idCol)

  // ------------------------------------------------------------- shingles

  /** Whitespace tokens, lowercased. */
  def tokens(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => t =!= "")

  /** Word n-gram shingles (distinct), the unit of Jaccard similarity. */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = tokens(textCol)
    // guard: Spark's sequence(1, 0) DESCENDS, so short texts need an
    // explicit empty result instead of a degenerate window start
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      array_distinct(filter(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))),
        s => s =!= "")))
  }

  /** Exact n-gram Jaccard similarity of two texts'; distinct-shingle
    * |∩| / |∪|. */
  def jaccard(aShingles: Column, bShingles: Column): Column = {
    val inter = size(array_intersect(aShingles, bShingles)).cast("double")
    val uni = size(array_union(aShingles, bShingles)).cast("double")
    when(uni === 0.0, lit(0.0)).otherwise(inter / uni)
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signature: each shingle string-hashes once (xxhash64), then a
    * one-pass codegen kernel derives all lanes with splitmix64 mixing —
    * deterministic and ~100× cheaper than per-lane string hashing. */
  def minHashSignature(shinglesCol: Column, numHashes: Int): Column =
    MinHashSigExpr(transform(shinglesCol, s => xxhash64(s)), numHashes)

  /** MinHash-LSH near-duplicate pairs (id_a < id_b, verified Jaccard ≥
    * `threshold`). Signature → `bands` bands of `numHashes/bands` rows;
    * a shared band bucket makes a candidate pair; candidates (and only
    * candidates) are verified with exact Jaccard over distinct shingles.
    */
  def minHashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleSize: Int = 3,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val rows = numHashes / bands
    // signature path is all codegen kernels (shingle hashing + lane mixing);
    // the string shingles are only materialized later, on candidate pairs
    val withSig = df
      .select(col(idCol),
        MinHashSigExpr(ShingleHashExpr(col(textCol), shingleSize), numHashes).as("sig"))
      .filter(size(col("sig")) > 0)
    // persist: both sides of the bucket self-join reference this frame —
    // without it the full-corpus signature scan runs twice
    val banded = withSig.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * lit(rows) + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = banded.join(
        banded.withColumnRenamed(idCol, "_id_b"), Seq("band", "bucket"))
      .filter(col(idCol) < col("_id_b"))
      .select(col(idCol).as("id_a"), col("_id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // exact-Jaccard verify: carry raw texts through the joins and shingle
    // AFTER them, so the (non-codegen) shingle HOFs run only on the few
    // candidate rows, not the whole corpus
    val texts = df.select(col(idCol), col(textCol))
    candidates
      .join(texts.select(col(idCol).as("id_a"), col(textCol).as("_t_a")), "id_a")
      .join(texts.select(col(idCol).as("id_b"), col(textCol).as("_t_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(shingles(col("_t_a"), shingleSize),
          shingles(col("_t_b"), shingleSize)), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash of a text's tokens (codegen one-pass kernel). */
  def simHash(textCol: Column): Column =
    SimHashExpr(transform(tokens(textCol), t => xxhash64(t)))

  /** SimHash near-duplicate pairs: bucket by the hash's 16-bit words (a
    * pair within Hamming distance ≤ 3 of 64 bits shares at least one of 4
    * words — pigeonhole), verify with exact packed Hamming ≤ `maxHamming`. */
  def simHashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol), simHash(col(textCol)).as("sh64"))
    val words = array((0 until 4).map(w =>
      shiftrightunsigned(col("sh64"), w * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val banded = hashed.select(col(idCol), col("sh64"), posexplode(words))
      .withColumnRenamed("pos", "word").withColumnRenamed("col", "bucket")
    val left = banded.select(col("word"), col("bucket"), col(idCol).as("id_a"), col("sh64").as("ha"))
    val right = banded.select(col("word"), col("bucket"), col(idCol).as("id_b"), col("sh64").as("hb"))
    left.join(right, Seq("word", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Distances.hammingPacked(array(col("ha")), array(col("hb"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: candidates share
    * an LSH code; verified with true cosine distance (1 - similarity) ≤
    * `maxCosineDistance`. */
  def cosineNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      maxCosineDistance: Double, params: LshParams): DataFrame = {
    val coded = Lsh.withCodes(df, vecCol, params)
      .select(col(idCol), col(vecCol), explode(col("codes")).as("code"))
    val left = coded.select(col("code"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val right = coded.select(col("code"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    left.join(right, "code")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Distances.cosineDistance(col("va"), col("vb")), 6).as("cos_dist"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cos_dist") <= maxCosineDistance)
  }
}
