package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exact prefix-filtered Jaccard self-join ([[Dedup.jaccardJoin]]):
  * losslessness of the prefix + length filters against a naive
  * all-pairs reference, the exact-integer boundary the double
  * arithmetic must not lose, and the identical-content expansion. */
class JaccardJoinSpec extends SparkSpec {
  import sqlImplicits._

  private def naive(df: org.apache.spark.sql.DataFrame, threshold: Double) = {
    val a = df.select($"doc_id".as("id_a"), Dedup.shingles($"text", 3).as("_sa"))
      .filter(size($"_sa") > 0)
    val b = df.select($"doc_id".as("id_b"), Dedup.shingles($"text", 3).as("_sb"))
      .filter(size($"_sb") > 0)
    a.crossJoin(b).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", round(Dedup.jaccard($"_sa", $"_sb"), 6).as("jaccard"))
      .filter($"jaccard" >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("matches the naive all-pairs join exactly on a mixed corpus (string vs hash shingles included)") {
    // deterministic corpus: shared vocabulary so docs overlap partially,
    // planted near-dups (one-word edits) and an exact copy
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => s"w$i")
    val bases = (0L until 30L).map { i =>
      i -> (0 until 10 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val edited = bases.take(8).map { case (i, t) =>
      val toks = t.split(" "); toks(toks.length / 2) = "edited"
      (i + 100L) -> toks.mkString(" ")
    }
    val copies = bases.slice(8, 12).map { case (i, t) => (i + 200L) -> t }
    val docs = (bases ++ edited ++ copies).toDF("doc_id", "text").cache()
    for (threshold <- Seq(0.5, 0.8)) {
      val joined = Dedup.jaccardJoin(docs, "doc_id", "text", threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(joined === naive(docs, threshold),
        s"prefix-filtered join diverged from naive all-pairs at threshold $threshold")
    }
  }

  test("keeps the exact-ratio boundary pair (A subset of B, |A| = 0.8 |B|)") {
    // B: 22 distinct words -> 20 distinct shingles; A: its 18-word prefix
    // -> 16 shingles, all contained in B's. J = 16/20 = 0.8 EXACTLY: the
    // length filter (16 >= 0.8*20) and the prefix length ceil(0.8*16)
    // both sit on integer boundaries where naive double products
    // (0.8*20 = 16.000000000000004) would wrongly exclude the pair.
    val words = (0 until 22).map(i => s"t$i")
    val docs = Seq(
      1L -> words.take(18).mkString(" "),
      2L -> words.mkString(" ")).toDF("doc_id", "text")
    val got = Dedup.jaccardJoin(docs, "doc_id", "text", threshold = 0.8).collect()
    assert(got.length === 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getDouble(2)) === ((1L, 2L, 0.8)))
  }

  test("identical content expands through the rep collapse; zero-shingle docs carry no evidence") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      1L -> base, 2L -> base, 3L -> base,          // exact-dup clique
      4L -> "alpha beta gamma delta epsilon zeta eta iota", // near-dup of the clique
      5L -> "tiny doc", 6L -> "tiny doc"           // < 3 tokens: no shingles
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardJoin(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // intra-group clique at J = 1.0 ...
    assert(pairs((1L, 2L)) === 1.0 && pairs((1L, 3L)) === 1.0 && pairs((2L, 3L)) === 1.0)
    // ... cross pairs reach every member, not just the representative ...
    val expected = Seq((1L, 4L), (2L, 4L), (3L, 4L))
    assert(expected.forall(pairs.contains), s"missing cross pairs in ${pairs.keySet}")
    assert(expected.map(pairs).distinct.size === 1)
    // ... and zero-shingle docs never pair, even as identical copies
    assert(!pairs.keySet.exists(p => p._1 >= 5L || p._2 >= 5L))
    // rows-level sanity: rep-level mining alone returns no member pairs
    val repOnly = Dedup.jaccardJoin(docs, "doc_id", "text", threshold = 0.5,
      expandDuplicates = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(repOnly === Set((1L, 4L)))
  }
}
