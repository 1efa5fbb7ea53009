package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{RepetitionProfileExpr, TokenProfileExpr, WordNgramsExpr}

/** Text-analysis operators for training-data pipelines (build-brief
  * extension beyond the reference surface): token counting, quality
  * scoring, language identification, document fingerprinting. All pure
  * column expressions — they run inside whole-stage codegen, no UDFs.
  */
object TextStats {

  /** Languages in the profile kernel, alphabetical; the profile array is
    * [n_tokens, punct_chars, n_chars, hits_de, hits_en, hits_es, hits_fr]. */
  private lazy val langsSorted: Seq[(String, Seq[String])] = stopwordsByLang.toSeq.sortBy(_._1)

  /** Shared one-pass token-profile column. Every derived stat below reads
    * from a structurally-equal copy of this expression, so whole-stage
    * codegen's subexpression elimination computes the scan once per row. */
  private def profile(textCol: Column): Column =
    TokenProfileExpr(textCol, langsSorted.map(_._2))

  private def nTokens(textCol: Column): Column = element_at(profile(textCol), 1)
  private def punctChars(textCol: Column): Column = element_at(profile(textCol), 2)
  private def nChars(textCol: Column): Column = element_at(profile(textCol), 3)
  private def langHits(textCol: Column, i: Int): Column = element_at(profile(textCol), 4 + i)

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = nTokens(textCol)

  /** BPE-ish subword count: splits on whitespace AND letter/digit/symbol
    * boundaries (e.g. "spark2.0!" → spark, 2, ., 0, !) — a cheap
    * tokenizer-free proxy for subword token counts. */
  def subwordCount(textCol: Column): Column =
    size(filter(
      split(lower(trim(textCol)), "(?<=[a-z])(?=[^a-z])|(?<=[0-9])(?=[^0-9])|(?<=[^a-z0-9\\s])(?=[^\\s])|\\s+"),
      t => t =!= "")).cast("long")

  /** Ratio of non-alphanumeric, non-whitespace chars to total chars. */
  def punctRatio(textCol: Column): Column = {
    val n = nChars(textCol).cast("double")
    when(n === 0.0, lit(0.0)).otherwise(punctChars(textCol).cast("double") / n)
  }

  /** Ratio of tokens that are (English) stopwords — a classic quality /
    * fluency signal. */
  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this")

  def stopwordRatio(textCol: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val n = nTokens(textCol).cast("double")
    val hits =
      if (stopwords == englishStopwords) langHits(textCol, langsSorted.indexWhere(_._1 == "en"))
      else element_at(TokenProfileExpr(textCol, Seq(stopwords)), 4)
    when(n === 0.0, lit(0.0)).otherwise(hits.cast("double") / n)
  }

  /** Composite quality score in [0,1]: length in a healthy band, modest
    * punctuation, nonzero stopword share. Deterministic, documented
    * weights — a scaffold for corpus filtering, not a learned model. */
  def qualityScore(textCol: Column): Column = {
    val nTok = tokenCount(textCol).cast("double")
    val lengthScore = least(nTok / 20.0, lit(1.0)) * when(nTok > 1000, 0.5).otherwise(1.0)
    val punctScore = lit(1.0) - least(punctRatio(textCol) * 4.0, lit(1.0))
    val stopScore = least(stopwordRatio(textCol) * 5.0, lit(1.0))
    round((lengthScore * 0.4 + punctScore * 0.3 + stopScore * 0.3), 6)
  }

  /** Tiny n-gram/stopword language-ID heuristic: score = stopword-hit
    * share per language, pick the argmax (ties → alphabetical). "und" when
    * nothing matches. */
  val stopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> englishStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "auf", "für"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "du", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "del", "para", "en"))

  def languageId(textCol: Column): Column = {
    val n = nTokens(textCol).cast("double")
    val scored = langsSorted.zipWithIndex.map { case ((lang, _), i) =>
      val hits = langHits(textCol, i).cast("double")
      struct((when(n === 0.0, 0.0).otherwise(hits / n)).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0.0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Rolling 8-char-gram fingerprint: the minimum md5 over all 8-char
    * windows (one-permutation winnowing). Stable under token reordering
    * noise at the edges; cheap dedup/citation key. */
  def fingerprint(textCol: Column, window: Int = 8): Column = {
    val n = length(textCol)
    when(n < window, md5(textCol.cast("binary"))).otherwise(
      array_min(transform(sequence(lit(1), n - (window - 1)),
        i => md5(substr(textCol, i, lit(window)).cast("binary")))))
  }

  /** Word n-gram count of the text ([[graft.functions.RepetitionProfileExpr]]
    * kernel — one codegen hash pass per row shared by every derived
    * repetition stat via subexpression elimination). */
  def ngramCount(textCol: Column, n: Int): Column =
    element_at(RepetitionProfileExpr(textCol, n), 1)

  /** Duplicate word-n-gram fraction — the share of n-gram OCCURRENCES
    * that are repeats of an earlier occurrence (Gopher/MassiveText-style
    * intra-document repetition signal): 1 − distinct/total. 0.0 for
    * texts with no n-grams. */
  def dupNgramFrac(textCol: Column, n: Int): Column = {
    val p = RepetitionProfileExpr(textCol, n)
    val tot = element_at(p, 1).cast("double")
    when(tot === 0.0, lit(0.0))
      .otherwise(lit(1.0) - element_at(p, 2).cast("double") / tot)
  }

  /** Character-weighted duplicate n-gram fraction — the share of n-gram
    * CHARACTERS inside grams occurring more than once (the published
    * form weights long boilerplate runs over short common collocations).
    * 0.0 for texts with no n-grams. */
  def dupNgramCharFrac(textCol: Column, n: Int): Column = {
    val p = RepetitionProfileExpr(textCol, n)
    val chars = element_at(p, 3).cast("double")
    when(chars === 0.0, lit(0.0))
      .otherwise(element_at(p, 4).cast("double") / chars)
  }

  /** Top-n-gram character fraction (Gopher A1.1): occurrences of the
    * single most frequent word n-gram × its character length, over the
    * total gram characters — the "one phrase dominates the page" signal
    * the duplicate fraction misses when the dominator is the ONLY
    * repeated gram. Ties break to the binary-smallest gram (kernel and
    * SQL replay agree). 0.0 for texts with no n-grams. */
  def topNgramCharFrac(textCol: Column, n: Int): Column = {
    val p = RepetitionProfileExpr(textCol, n)
    val chars = element_at(p, 3).cast("double")
    when(chars === 0.0, lit(0.0))
      .otherwise(element_at(p, 5).cast("double") / chars)
  }

  /** Duplicate segment (line / paragraph) fraction — share of non-empty
    * segments that are exact repeats of an earlier one:
    * 1 − distinct/total ([[graft.functions.SegmentRepetitionExpr]],
    * `sep = "\n"` for lines, `"\n\n"` for paragraphs). */
  def dupSegmentFrac(textCol: Column, sep: String): Column = {
    val p = graft.functions.SegmentRepetitionExpr(textCol, sep)
    val tot = element_at(p, 1).cast("double")
    when(tot === 0.0, lit(0.0))
      .otherwise(lit(1.0) - element_at(p, 2).cast("double") / tot)
  }

  /** Character-weighted duplicate segment fraction — share of segment
    * characters inside segments occurring more than once. */
  def dupSegmentCharFrac(textCol: Column, sep: String): Column = {
    val p = graft.functions.SegmentRepetitionExpr(textCol, sep)
    val chars = element_at(p, 3).cast("double")
    when(chars === 0.0, lit(0.0))
      .otherwise(element_at(p, 4).cast("double") / chars)
  }

  /** The FULL Gopher repetition battery (Rae et al. 2112.11446 A1.1) as
    * one struct column — the 13 repetition cuts most large-corpus
    * pipelines apply beside the word-level rules of [[gopherProfile]]:
    * duplicate line/paragraph fraction ≤ 0.30, duplicate line/paragraph
    * CHARACTER fraction ≤ 0.20, top-{2,3,4}-gram character fraction ≤
    * {0.20, 0.18, 0.16}, duplicate-{5..10}-gram character fraction ≤
    * {0.15, 0.14, 0.13, 0.12, 0.11, 0.10}. All fractions are rounded
    * 6dp BEFORE the threshold compare (the repo-wide freeze, so both
    * engines cut identically at the boundary); `keep` is the AND of all
    * thirteen. Narrow per-document codegen kernels throughout — one
    * [[graft.functions.RepetitionProfileExpr]] pass per n (9), two
    * [[graft.functions.SegmentRepetitionExpr]] passes — zero shuffle. */
  def gopherRepetition(textCol: Column): Column = {
    val dupLine = round(dupSegmentFrac(textCol, "\n"), 6)
    val dupPara = round(dupSegmentFrac(textCol, "\n\n"), 6)
    val dupLineCh = round(dupSegmentCharFrac(textCol, "\n"), 6)
    val dupParaCh = round(dupSegmentCharFrac(textCol, "\n\n"), 6)
    val tops = Seq(2, 3, 4).map(n => n -> round(topNgramCharFrac(textCol, n), 6))
    val dups = Seq(5, 6, 7, 8, 9, 10).map(n => n -> round(dupNgramCharFrac(textCol, n), 6))
    val topBars = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupBars = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
    val keep = Seq(
      dupLine <= 0.30, dupPara <= 0.30, dupLineCh <= 0.20, dupParaCh <= 0.20) ++
      tops.map { case (n, c) => c <= topBars(n) } ++
      dups.map { case (n, c) => c <= dupBars(n) }
    struct(
      (Seq(dupLine.as("dup_line_frac"), dupPara.as("dup_para_frac"),
        dupLineCh.as("dup_line_char_frac"), dupParaCh.as("dup_para_char_frac")) ++
        tops.map { case (n, c) => c.as(s"top${n}_char_frac") } ++
        dups.map { case (n, c) => c.as(s"dup${n}_char_frac") } :+
        keep.reduce(_ && _).as("keep")): _*)
  }

  /** Training-data text scrub: strip URLs and email addresses (the
    * standard PII/noise pass before tokenization), then collapse runs of
    * whitespace and trim. Pure codegen'd regexp_replace chain — patterns
    * restricted to syntax with identical semantics in Java regex and RE2
    * so a SQL oracle replays the scrub byte-for-byte. */
  def scrub(textCol: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(textCol, "https?://[^\\s]+", " "),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", " "),
      "\\s+", " "))

  /** PII redaction — the tag-preserving counterpart of [[scrub]] (which
    * DELETES urls/emails): email addresses, IBAN-shaped account codes,
    * dotted-quad IPs and phone-shaped digit runs are replaced with
    * `[EMAIL]` / `[IBAN]` / `[IP]` / `[PHONE]` placeholders so
    * downstream stats keep a token where the entity was (the convention
    * C4-style cleaning pipelines use so sentence shape survives
    * redaction). ORDER IS LOAD-BEARING: IBAN before phone (an IBAN's
    * digit run is phone-shaped), IP before phone; tags carry no digits
    * or `@`, so earlier replacements cannot re-match later patterns.
    * Patterns restricted
    * to syntax with identical Java-regex/RE2 semantics (explicit
    * classes, no `\b`, no `\s`) so a SQL oracle replays byte-for-byte;
    * codegen'd `regexp_replace` chain, narrow. */
  def redact(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(textCol,
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
          "[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}", "[IBAN]"),
        "([0-9]{1,3}\\.){3}[0-9]{1,3}", "[IP]"),
      "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "[PHONE]")

  /** All word-n-gram OCCURRENCES of the text (lowercased, [[graft.pipeline.Dedup.tokens]]'
    * whitespace split) — NOT distinct, unlike `Dedup.shingles`: corpus
    * frequency counting needs every occurrence. One codegen kernel pass
    * ([[graft.functions.WordNgramsExpr]]) instead of the interpreted
    * HOF slice-and-concat chain — same tokenization contract, ~100 ns/gram
    * vs ~19 µs/gram, and it keeps the explode inside whole-stage codegen. */
  def ngrams(textCol: Column, n: Int): Column = WordNgramsExpr(textCol, n)

  /** Corpus-wide top-k n-grams by occurrence count — the standard
    * boilerplate/stopword-list builder over a training corpus. Two
    * passes, chosen for shuffle volume at scale:
    *
    * Pass 1 ranks grams by occurrence count ALONE — the (count desc,
    * gram asc) cut never looks at doc_freq, so the ranking aggregate
    * carries no document id. Map-side partial aggregation therefore
    * collapses per-partition repeats before the shuffle: hot boilerplate
    * grams cross the network once per partition, not once per
    * occurrence. (A single-pass `countDistinct(doc)` alongside the count
    * would force Catalyst's distinct-aggregate expand, making the
    * shuffle key `(gram, doc)` — every occurrence crosses the network, a
    * full shuffle of the tokenized corpus at 100 TB.)
    *
    * Pass 2 computes EXACT doc_freq for only the k winners: a broadcast
    * semi-join prunes the re-scanned pairs to k grams, then a map-side-
    * partial distinct on (gram, doc) collapses within-partition repeats
    * before a shuffle bounded by k × docs-containing-a-winner — tiny.
    * Two corpus scans buy the removal of the corpus-wide shuffle. The
    * k-row winners frame is eagerly localCheckpoint'd before reuse (it
    * feeds both the pass-2 semi-join and the final join), so the
    * corpus-wide ranking aggregate runs ONCE — without it each reuse
    * re-executes the full pass-1 scan. */
  def topNgrams(df: DataFrame, idCol: String, textCol: String, n: Int,
      k: Int): DataFrame = {
    val pairs = ngramPairs(df, idCol, textCol, n)
    val winners = rankNgrams(pairs, k)
      .localCheckpoint(true) // eager, k rows, ContextCleaner-freed
    val docFreq = pairs
      .join(broadcast(winners.select("gram")), Seq("gram"), "left_semi")
      .distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("doc_freq"))
    winners.join(broadcast(docFreq), Seq("gram"))
      .select(col("gram"), col("occurrences"), col("doc_freq"))
      .orderBy(col("occurrences").desc, col("gram").asc)
  }

  /** Pass 1 of [[topNgrams]], exposed for plan-shape pinning: the
    * corpus-wide ranking aggregate over exploded (doc, gram) pairs. The
    * cut is by occurrence count alone (no doc id in the shuffle key, so
    * map-side partial agg collapses repeats) and the top-k must plan as
    * `TakeOrderedAndProject`, never a full sort or a distinct-aggregate
    * Expand — [[topNgrams]] checkpoints this k-row result before reusing
    * it, which hides this subplan from the final `.explain`. */
  private[pipeline] def rankNgrams(pairs: DataFrame, k: Int): DataFrame =
    pairs.groupBy(col("gram"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("gram").asc)
      .limit(k)

  /** The exploded (doc, gram) pair frame both [[topNgrams]] passes scan. */
  private[pipeline] def ngramPairs(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("_id"), explode(ngrams(col(textCol), n)).as("gram"))

  /** Boilerplate removal — the standard consumer of [[topNgrams]]: build
    * the corpus boilerplate list (top-k n-grams whose doc frequency is at
    * or above `docFreqBar`), then drop every LINE containing one of those
    * grams and reassemble each document from its surviving lines in
    * original order (C4-style line-level boilerplate stripping).
    * Documents whose every line is boilerplate come back with empty text
    * rather than disappearing — row count is stable, so the pass composes
    * with downstream per-doc stats.
    *
    * Scale shape — two jobs, one corpus ranking scan, no checkpoint:
    * pass 1's k winners are a BOUNDED collect (k grams ride the task
    * closure as a literal — the same bounded-artifact pattern as IVF
    * centroids), replacing `topNgrams`' shared-reuse localCheckpoint,
    * which a single-use caller pays for without reusing (r10 measured
    * it as this composite's 0.19 → 0.62 s regression). Pass 2 (exact
    * doc_freq for the winners, narrow literal membership filter +
    * bounded distinct agg) stays LAZY and fuses into the output job as
    * a broadcast-semi-join subtree, so no third job materializes. The
    * only corpus-wide shuffle is the per-doc reassembly groupBy, which
    * IS the materialization of the output. Line grams reuse the
    * [[graft.functions.WordNgramsExpr]] codegen kernel. */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, docFreqBar: Long): DataFrame = {
    val pairs = ngramPairs(df, idCol, textCol, n)
    // pass 1: the k winners by occurrence count — bounded collect (k
    // rows ride the closure as a literal from here on)
    val winners = rankNgrams(pairs, k).select("gram")
      .collect().map(_.getString(0)).toSeq
    // pass 2 (lazy — fuses into the output job): exact doc_freq for ONLY
    // the k winners via a narrow literal membership filter, bar-filtered
    // to the ≤ k boilerplate grams and broadcast into the line semi-join
    val boiler = pairs
      .filter(col("gram").isInCollection(winners))
      .distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= docFreqBar)
      .select("gram")
    val lines = df.select(col(idCol).as("_id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val hit = lines
      .select(col("_id"), col("pos"),
        explode(WordNgramsExpr(col("line"), n)).as("gram"))
      .join(broadcast(boiler), Seq("gram"), "left_semi")
      .select("_id", "pos").distinct()
    val rebuilt = lines.join(hit, Seq("_id", "pos"), "left_anti")
      .groupBy(col("_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("text_stripped"))
    df.select(col(idCol).as("_id"))
      .join(rebuilt, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("text_stripped"), lit("")).as("text_stripped"))
  }

  /** The Gopher rules' stop list (Rae et al. 2021, appendix A1.1): a doc
    * must contain at least two occurrences drawn from these eight. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Document-level Gopher quality rules (Rae et al. 2021, appendix
    * A1.1) as one struct column — the published heuristic battery most
    * training-data pipelines start from:
    *
    *   1. word count within `[minWords, maxWords]`
    *   2. mean word length within [3, 10] characters
    *   3. symbol-to-word ratio (`#` chars + `...` runs) at most 0.1
    *   4. at least 80% of words contain an alphabetic character
    *   5. at least two stop-word occurrences ([[gopherStopwords]])
    *
    * (The paper's remaining two rules are line-level — bullet/ellipsis
    * line shares — and belong to the boilerplate family served by
    * [[stripBoilerplate]].) Pure codegen column expressions, narrow at
    * any scale; explicit whitespace class and no `\b`/`\s` so a SQL
    * oracle replays byte-for-byte. Ratios are rounded to 6 decimals;
    * rule comparisons use the unrounded doubles, which both engines
    * derive from identical integer counts (exact, order-free). */
  def gopherProfile(textCol: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    val toks = filter(split(trim(textCol), "[ \\t\\n\\x0B\\f\\r]+"), t => t =!= "")
    val nw = size(toks).cast("long")
    val nwD = nw.cast("double")
    val charSum = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val meanLen = when(nw === 0L, lit(0.0)).otherwise(charSum.cast("double") / nwD)
    val hashes = (length(textCol) - length(replace(textCol, lit("#"), lit("")))).cast("long")
    val ellipses = ((length(textCol) - length(replace(textCol, lit("..."), lit("")))) / 3).cast("long")
    val symRatio = when(nw === 0L, lit(0.0)).otherwise((hashes + ellipses).cast("double") / nwD)
    val alphaFrac = when(nw === 0L, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nwD)
    val stopHits = size(filter(toks, t => lower(t).isin(gopherStopwords: _*))).cast("long")
    val keep = nw >= minWords && nw <= maxWords &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symRatio <= 0.1 && alphaFrac >= 0.8 && stopHits >= 2L
    struct(
      nw.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symRatio, 6).as("symbol_ratio"),
      round(alphaFrac, 6).as("alpha_frac"),
      stopHits.as("stop_hits"),
      keep.as("keep"))
  }

  /** C4 line-level cleaning (Raffel et al., arXiv:1910.10683 §2.2): keep
    * only lines that end in terminal punctuation (`.` `!` `?` `"`) and
    * carry ≥ `minWords` words; a document survives when ≥ `minLines`
    * lines remain AND it contains neither a curly brace (code) nor
    * "lorem ipsum" (placeholder). Entirely in-row column expressions —
    * string and integer ops only, ZERO shuffle at any scale, and every
    * predicate replays verbatim in SQL (explicit whitespace class,
    * `right(…, 1)` membership instead of a regex anchor). */
  def c4KeptLines(textCol: Column, minWords: Int = 5): Column =
    filter(split(textCol, "\n", -1), l => {
      val t = trim(l)
      substring(t, -1, 1).isin(".", "!", "?", "\"") &&
        size(filter(split(t, "[ \\t\\x0B\\f\\r]+"), w => w =!= "")) >= minWords
    })

  /** The C4 document verdict columns over [[c4KeptLines]]:
    * `(n_lines, n_kept, keep, text)`. */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val kept = c4KeptLines(col(textCol), minWords)
    df.select(col(idCol),
      size(split(col(textCol), "\n", -1)).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      (size(kept) >= minLines &&
        !col(textCol).contains("{") &&
        !lower(col(textCol)).contains("lorem ipsum")).as("keep"),
      array_join(kept, "\n").as("text"))
  }

  /** One-call profile: every stat as a column. */
  def profile(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_subwords", subwordCount(col(textCol)))
      .withColumn("punct_ratio", round(punctRatio(col(textCol)), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(col(textCol)), 6))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_id", languageId(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
}
