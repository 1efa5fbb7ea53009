package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import sqlImplicits._

  private def one[T](text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T =
    Seq(Tuple1(text)).toDF("t").select(c(col("t"))).head().getAs[T](0)

  test("token and subword counts") {
    assert(one[Long]("the quick  brown fox", TextStats.tokenCount) === 4L)
    assert(one[Long]("  ", TextStats.tokenCount) === 0L)
    // spark2.0! -> spark | 2 | . | 0 | !
    assert(one[Long]("spark2.0!", TextStats.subwordCount) === 5L)
  }

  test("punct ratio counts non-alphanumeric non-space chars") {
    assert(one[Double]("ab,.", c => TextStats.punctRatio(c)) === 0.5)
    assert(one[Double]("", c => TextStats.punctRatio(c)) === 0.0)
  }

  test("stopword ratio over the english list") {
    assert(one[Double]("the cat sat on a mat", c => TextStats.stopwordRatio(c)) === 3.0 / 6.0)
  }

  test("language id picks the stopword-argmax language; und when nothing hits") {
    assert(one[String]("the cat is on the mat", TextStats.languageId) === "en")
    assert(one[String]("der hund ist nicht auf der couch und das ist gut", TextStats.languageId) === "de")
    assert(one[String]("le chat est dans la maison et il dort", TextStats.languageId) === "fr")
    assert(one[String]("xyzzy plugh qwerty", TextStats.languageId) === "und")
  }

  test("fingerprint: stable per content, window-min semantics, short-text fallback") {
    val a = one[String]("abcdefghij", c => TextStats.fingerprint(c))
    val b = one[String]("abcdefghij", c => TextStats.fingerprint(c))
    assert(a === b && a.length === 32)
    // text shorter than the window hashes whole
    val s = one[String]("abc", c => TextStats.fingerprint(c))
    assert(s === one[String]("abc", c => md5(c.cast("binary"))))
    // appending text can only lower (or keep) the min-hash — monotone window set
    val ext = one[String]("abcdefghijk", c => TextStats.fingerprint(c))
    assert(ext <= a)
  }

  test("quality score lands in [0,1] and ranks fluent text above noise") {
    val good = one[Double]("the quick brown fox jumps over the lazy dog and then it runs into the woods again today", c => TextStats.qualityScore(c))
    val noisy = one[Double]("@@!! ## $$$ %% ^^", c => TextStats.qualityScore(c))
    assert(good > noisy)
    assert(good >= 0.0 && good <= 1.0 && noisy >= 0.0 && noisy <= 1.0)
  }

  test("topNgrams counts every occurrence, carries doc frequency, breaks ties by gram") {
    import sqlImplicits._
    val d = Seq(
      (1L, "a b c a b c a b c"),  // "a b c" ×3 (+ wraps "b c a" ×2, "c a b" ×2)
      (2L, "a b c x y z"),
      (3L, "x y z x y z")         // "x y z" ×2 (+ "y z x", "z x y")
    ).toDF("doc_id", "text")
    val top = TextStats.topNgrams(d, "doc_id", "text", n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top(0) === (("a b c", 4L, 2L)))   // 3 in doc 1 + 1 in doc 2
    assert(top(1) === (("x y z", 3L, 2L)))   // 1 in doc 2 + 2 in doc 3
    // rank 3: "b c a"/"c a b" both at 2 — lexicographic tiebreak picks "b c a"
    assert(top(2) === (("b c a", 2L, 1L)))
    // bounded plan: pass 1's top-k is a TakeOrderedAndProject, never a
    // full sort — pinned on the pass-1 subplan directly, because
    // topNgrams localCheckpoints the k-row winners (so the ranking
    // aggregate runs once across its two reuses) which hides this
    // subplan from the final explain
    val p = TextStats.rankNgrams(TextStats.ngramPairs(d, "doc_id", "text", 3), 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"want bounded top-k, got:\n${p.take(600)}")
    // two-pass shape: the ranking aggregate must NOT carry the doc id —
    // a single-pass countDistinct would surface as an Expand over
    // (gram, doc_id), shuffling every occurrence at corpus scale
    assert(!p.contains("Expand"), s"distinct-aggregate expand crept back:\n${p.take(600)}")
  }

  test("redact replaces IPs and phone-shaped runs with tags, leaves prose alone") {
    assert(one[String]("server 192.168.1.100 and 10.0.0.1 up",
      c => TextStats.redact(c)) === "server [IP] and [IP] up")
    assert(one[String]("call +1 (555) 123-4567 now",
      c => TextStats.redact(c)) === "call [PHONE] now")
    // IP runs first; the [IP] tag has no digits, so the phone pattern
    // cannot re-match across it
    assert(one[String]("x 10.0.0.1 555-123-4567 y",
      c => TextStats.redact(c)) === "x [IP] [PHONE] y")
    // short digit runs (< 8 chars) and plain prose survive
    assert(one[String]("room 1234, call 911", c => TextStats.redact(c))
      === "room 1234, call 911")
  }

  test("redact handles email and IBAN classes, order-proof against the phone pattern") {
    assert(one[String]("mail Bob.Smith+x@Example.co.uk today",
      c => TextStats.redact(c)) === "mail [EMAIL] today")
    // an IBAN's digit run is phone-shaped — [IBAN] must win the race
    assert(one[String]("acct DE89370400440532013000 closed",
      c => TextStats.redact(c)) === "acct [IBAN] closed")
    // dotted-quad "domain" is not an email (TLD must be alphabetic) —
    // the IP class still catches the address part
    assert(one[String]("x root@10.0.0.1 y", c => TextStats.redact(c))
      === "x root@[IP] y")
    // all four classes in one string
    assert(one[String](
      "a@b.co DE89370400440532013000 10.0.0.1 +1 (555) 123-4567",
      c => TextStats.redact(c)) === "[EMAIL] [IBAN] [IP] [PHONE]")
    // near-misses survive: two-letter uppercase word + short digits,
    // at-sign without a dotted TLD
    assert(one[String]("ID 1234 sent to user@localhost",
      c => TextStats.redact(c)) === "ID 1234 sent to user@localhost")
  }

  test("ngrams keeps duplicates and guards short texts") {
    import sqlImplicits._
    val d = Seq(("a b a b", 0)).toDF("text", "i")
    val g = d.select(TextStats.ngrams($"text", 2).as("g")).head().getSeq[String](0)
    assert(g === Seq("a b", "b a", "a b"))
    val short = d.select(TextStats.ngrams($"text", 5).as("g")).head().getSeq[String](0)
    assert(short === Seq.empty)
    // n < 1 fails fast at build time — n=0 would emit tokens+1 empty
    // grams and negative n out-of-spec rows
    intercept[IllegalArgumentException](TextStats.ngrams($"text", 0))
    intercept[IllegalArgumentException](TextStats.ngrams($"text", -1))
    // the kernel's separator set includes \x0B (vertical tab) — Java \s
    // parity; RE2 replays must spell the class out (see WordNgramsExpr)
    val vt = Seq(("a\u000Bb c", 0)).toDF("text", "i")
    assert(vt.select(TextStats.ngrams($"text", 2).as("g")).head().getSeq[String](0)
      === Seq("a b", "b c"))
  }

  test("stripBoilerplate drops boilerplate lines, keeps order, keeps empty docs") {
    import sqlImplicits._
    // "click here now" appears in all 3 docs -> doc_freq 3 >= bar 3;
    // every other gram is doc-unique
    val d = Seq(
      (1L, "real content one\nclick here now\nmore real text"),
      (2L, "click here now"),
      (3L, "unique line alpha\nunique line beta\nplease click here now today")
    ).toDF("doc_id", "text")
    val out = TextStats.stripBoilerplate(d, "doc_id", "text", n = 3, k = 5,
        docFreqBar = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // boilerplate line removed, surviving lines rejoin in original order
    assert(out(1L) === "real content one\nmore real text")
    // a fully-boilerplate doc stays as a row with empty text
    assert(out(2L) === "")
    // the gram matches INSIDE a longer line too ("please click here now today")
    assert(out(3L) === "unique line alpha\nunique line beta")
    assert(out.size === 3)
  }

  test("stripBoilerplate on empty and all-unique corpora is a no-op (empty winner list)") {
    import sqlImplicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextStats.stripBoilerplate(empty, "doc_id", "text", 3, 5, 2L).collect().isEmpty)
    val uniq = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = TextStats.stripBoilerplate(uniq, "doc_id", "text", 3, 5, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "alpha beta gamma delta")
  }

  test("stripBoilerplate broadcasts the boilerplate list") {
    import sqlImplicits._
    val d = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val p = TextStats.stripBoilerplate(d, "doc_id", "text", 3, 5, 2L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"boilerplate list must broadcast, got:\n${p.take(800)}")
  }

  test("gopherProfile rules: word count, mean length, symbols, alpha share, stop words") {
    import org.apache.spark.sql.Row
    def g(text: String, minWords: Int = 5): Row =
      one[Row](text, c => TextStats.gopherProfile(c, minWords = minWords))
    // fluent doc with two stopword occurrences passes every rule
    val good = g("the cat and the dog ran over green hills")
    assert(good.getAs[Long]("n_words") === 9L)
    assert(good.getAs[Long]("stop_hits") === 3L) // the, and, the
    assert(good.getAs[Boolean]("keep"))
    // word-count floor
    assert(!g("the and cat").getAs[Boolean]("keep"))
    // symbol rule: '#' chars and '...' runs count against words
    val sym = g("the cat and # dog # sat # on # a ... mat")
    assert(sym.getAs[Double]("symbol_ratio") === 0.384615) // round(5/13, 6)
    assert(!sym.getAs[Boolean]("keep"))
    // alpha rule: mostly-numeric docs fail the 80% alpha-word floor
    val num = g("the 12 34 56 78 90 and 11")
    assert(num.getAs[Double]("alpha_frac") === 2.0 / 8.0)
    assert(!num.getAs[Boolean]("keep"))
    // stop-word floor: needs two OCCURRENCES
    assert(!g("the cat sat over green mats").getAs[Boolean]("keep"))
    // mean word length ceiling (>10 chars/word)
    assert(!g("the with extraordinarily incomprehensibilities notwithstanding internationalization")
      .getAs[Boolean]("keep"))
    // empty text: zero words, all-zero stats, rejected
    val empty = g("   ")
    assert(empty.getAs[Long]("n_words") === 0L && !empty.getAs[Boolean]("keep"))
  }

  test("C4 line filter: terminal punctuation + word floor per line, doc-level verdict") {
    val good = "this line has five good words.\nanother proper sentence right here friend!\nand a third full sentence stands here?"
    val d = Seq(
      (1L, good),                                        // 3 kept lines -> keep
      (2L, "too short.\nno terminal punctuation here at all\nthis one is long enough to pass muster."), // 1 kept
      (3L, good + "\nvar x = { a: 1 };"),                // brace kills the doc
      (4L, good.toUpperCase + "\nLorem Ipsum dolor sit amet friend."), // lorem kills it
      (5L, "")).toDF("doc_id", "text")
    val out = TextStats.c4LineFilter(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    assert(out(1L) === ((3L, 3L, true, good)))
    assert(out(2L)._2 === 1L && !out(2L)._3)
    assert(out(2L)._4 === "this one is long enough to pass muster.")
    assert(out(3L)._2 === 3L && !out(3L)._3) // lines fine, brace rule fails
    assert(!out(4L)._3)                      // lorem ipsum, case-insensitive
    assert(out(5L) === ((1L, 0L, false, "")))
  }

  test("C4 line filter plan is one narrow projection (no shuffle)") {
    val d = Seq((1L, "a.\nb.")).toDF("doc_id", "text")
    val plan = TextStats.c4LineFilter(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
