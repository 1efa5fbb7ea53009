package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UnigramEncodeExpr

/** Unigram-LM (SentencePiece-style) tokenizer induction beside BPE —
  * Kudo, "Subword Regularization" (arXiv:1804.10959), re-expressed for
  * exact cross-engine replay (r11 verdict item 5):
  *
  *  - seed vocabulary = the `seedSize` most frequent multi-character
  *    substrings (length ≤ `maxPieceLen`, occurrence-weighted by word
  *    frequency; ties to the UTF-8-smaller piece) plus every single
  *    character;
  *  - piece costs = FROZEN integer micro-nats, `μ(Σcnt) − μ(cnt)` with
  *    `μ(x) = floor(ln(x)·1e6 + 0.5)` (the [[LmPpl]] discipline) — the
  *    negative log-probability as an exact integer;
  *  - EM rounds are HARD (Viterbi) EM — each round re-segments every
  *    distinct word by integer min-plus DP and re-estimates costs from
  *    the winning segmentations' piece usage. A declared deviation from
  *    Kudo's soft (forward-backward) EM: expected counts under soft EM
  *    are irrational sums no SQL oracle can replay exactly, while hard
  *    EM keeps every intermediate an integer — same fixed point family,
  *    deterministic end-to-end;
  *  - the final round prunes to the `vocabSize` highest-usage
  *    multi-character pieces (usage DESC, piece ASC), keeping all single
  *    characters (Kudo's irreducibility condition).
  *
  * Scale shape: the corpus collapses to a DISTINCT-WORD frequency frame
  * in one map-side-partial pass (shuffle bounded by distinct words, not
  * corpus bytes — the [[Bpe]] discipline); every round is one narrow
  * kernel pass over that frame plus a vocab-bounded aggregate; the
  * vocabulary (≤ seedSize + alphabet) rides the kernel closure as a
  * bounded literal. Words longer than `maxWordLen` are excluded from
  * training and encode as one unsegmented piece (SentencePiece's
  * length-cap convention; also bounds the oracle's enumeration).
  */
object Unigram {

  val DefaultMaxPieceLen = 5
  val DefaultSeedSize = 120
  val DefaultVocabSize = 60
  val DefaultRounds = 2
  val MaxWordLen = 24

  /** `μ(x)`: ln frozen to integer micro-nats, half-up. */
  def micro(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong

  /** Distinct corpus words with frequencies under the BPE tokenizer
    * contract (lowercase, explicit whitespace class, no `'|'`), length
    * ≤ [[MaxWordLen]]. One exploded pass, map-side partial agg. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) <= MaxWordLen && !col("word").contains("|"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** All substring occurrences (length ≤ maxPieceLen) weighted by word
    * frequency → `(piece, cnt)`. */
  private def substringCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("freq"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - i + 1)),
          l => col("word").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** Costs from a bounded `(piece, cnt)` vocabulary. */
  private def toCosts(vocab: Seq[(String, Long)]): Seq[(String, Long)] = {
    val t = vocab.map(_._2).sum
    vocab.map { case (p, c) => p -> (micro(t) - micro(c)) }
  }

  /** Piece usage of the Viterbi-best segmentations under `costs`:
    * one kernel pass over the distinct-word frame, pieces recovered from
    * the pipe framing, weighted by word frequency. */
  def usage(words: DataFrame, costs: Seq[(String, Long)], maxPieceLen: Int): DataFrame =
    words.select(col("freq"),
        UnigramEncodeExpr(col("word"), costs, maxPieceLen, MaxWordLen).as("enc"))
      .select(col("freq"), explode(split(
        // strip the outer frame pipes, split piece separators
        expr("substring(enc, 2, length(enc) - 2)"), "\\|\\|")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** Train: returns the final vocabulary `(piece, cnt, cost_micro)`. */
  def fit(df: DataFrame, textCol: String,
      vocabSize: Int = DefaultVocabSize, maxPieceLen: Int = DefaultMaxPieceLen,
      seedSize: Int = DefaultSeedSize, rounds: Int = DefaultRounds): Seq[(String, Long, Long)] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val words = wordFreqs(df, textCol).localCheckpoint(true)
    val sub = substringCounts(words, maxPieceLen).localCheckpoint(true)
    // the corpus alphabet (single chars), fixed across rounds
    val singles: Seq[(String, Long)] = sub.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val seedTop = sub.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    var vocab: Seq[(String, Long)] = seedTop ++ singles
    var costs = toCosts(vocab)
    var r = 1
    while (r <= rounds) {
      val u = usage(words, costs, maxPieceLen).collect()
        .map(row => row.getString(0) -> row.getLong(1)).toSeq
      val used = u.map(_._1).toSet
      // retained zero-usage single chars keep a floor count of 1
      var v = u ++ singles.filter(s => !used.contains(s._1)).map(s => s._1 -> 1L)
      if (r == rounds) {
        // (usage DESC, piece ASC) with pieces in UTF-8 BYTE order — the
        // engine-shared tie the SQL replay's ORDER BY piece compares
        // code-point length, not UTF-16 units: a supplementary char
        // (String.length == 2) is a SINGLE character and must be kept
        // unconditionally, matching DuckDB length() = code points
        def cpLen(s: String): Int = s.codePointCount(0, s.length)
        val multi = v.filter(p => cpLen(p._1) >= 2)
          .sortWith((a, b) => a._2 > b._2 ||
            (a._2 == b._2 && graft.functions.RepetitionProfile.utf8Less(a._1, b._1)))
          .take(vocabSize)
        v = multi ++ v.filter(p => cpLen(p._1) == 1)
      }
      vocab = v
      costs = toCosts(v)
      r += 1
    }
    val costMap = costs.toMap
    vocab.map { case (p, c) => (p, c, costMap(p)) }
  }

  private val fitted =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Long, Long)]]()
  /** Memoized per-dataset fit (pure values — keyed by dir). */
  def fitFor(s: SparkSession, dir: String, textCol: String = "text"): Seq[(String, Long, Long)] =
    fitted.computeIfAbsent(dir, _ =>
      fit(s.read.parquet(s"$dir/documents.parquet"), textCol))

  /** Encode a corpus with a trained vocabulary: one narrow kernel pass. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long, Long)], maxPieceLen: Int = DefaultMaxPieceLen): DataFrame =
    df.select(col(idCol),
      UnigramEncodeExpr(col(textCol), vocab.map(v => v._1 -> v._3), maxPieceLen,
        MaxWordLen).as("encoded"))
}
