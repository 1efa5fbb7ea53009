package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** TRAINED language identification (r12 verdict Next #4) — the
  * fastText-style hashed char-n-gram linear classifier (Joulin et al.
  * 2016, arXiv:1607.01759), in its exactly-replayable multinomial
  * Naive-Bayes form (a linear model over hashed n-gram counts whose
  * weights are closed-form — no SGD, so training is ONE distributed
  * aggregation and the DuckDB oracle replays it to the last bit):
  *
  *   pred(doc) = argmax_c [ ln P(c) + Σ_grams ln P(bucket(g) | c) ]
  *
  * with Laplace-smoothed bucket probabilities over a fixed hashed
  * trigram space and all log-probs FROZEN to integer micro-nats
  * (the [[Dsir]]/[[LmPpl]] discipline) — document scores are exact
  * integer sums in any order, ties break to the lexicographically
  * smallest class.
  *
  * Scale shape: training is one exploded char-trigram scan whose
  * shuffle collapses to `classes × buckets` keys under map-side partial
  * aggregation (never more rows than the bounded grid, regardless of
  * corpus bytes); the fitted model is a bounded driver array
  * broadcast-literal into a narrow scoring pass — no join, no second
  * shuffle, zero corpus-wide sort. The class count is counted BEFORE
  * the grid collect and must stay ≤ [[MaxClasses]].
  */
object LangId {

  val MaxClasses = 16

  /** Engine-stable hashed trigram bucket (md5 hex prefix, the
    * [[Dsir.bucket]] idiom). */
  def bucket(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram), 1, 4), 16, 10).cast("long") % buckets

  /** Char trigrams of `t` (1-based positions, length-3 windows).
    * Spark's `sequence(1, n)` DESCENDS for n < 1, so short strings are
    * guarded to an empty array (DuckDB's generate_series is empty
    * there by itself). */
  def charGrams(t: Column): Column =
    when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** Fitted model: classes in ascending name order, each with its
    * micro-nat prior and a `buckets`-sized micro-nat log-prob table. */
  final case class Model(classes: Seq[String], priorsMicro: Array[Long],
      weightsMicro: Array[Array[Long]]) {
    def buckets: Int = weightsMicro.head.length
  }

  /** Train on the labeled rows of `df`: one exploded trigram scan into
    * a `(label, bucket)` grid (bounded shuffle), plus one label-count
    * aggregate for the priors. */
  def fit(df: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 1024): Model = {
    val labeled = df.filter(col(labelCol).isNotNull)
    val nClasses = labeled.select(countDistinct(col(labelCol))).head().getLong(0)
    require(nClasses > 0 && nClasses <= MaxClasses,
      s"lang_id supports 1..$MaxClasses classes, got $nClasses — " +
        "a label column with unbounded cardinality would make the model grid unbounded")
    val docCounts = labeled.groupBy(col(labelCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val classes = docCounts.keys.toSeq.sorted
    val totalDocs = docCounts.valuesIterator.sum
    val grid = labeled
      .select(col(labelCol).as("c"), explode(charGrams(col(textCol))).as("g"))
      .select(col("c"), bucket(col("g"), buckets).as("b"))
      .groupBy(col("c"), col("b")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    val totals = classes.map(c =>
      c -> grid.iterator.filter(_._1._1 == c).map(_._2).sum).toMap
    val priors = classes.map(c =>
      math.floor(math.log(docCounts(c).toDouble / totalDocs) * 1e6 + 0.5).toLong)
    val weights = classes.map { c =>
      val t = totals(c)
      Array.tabulate(buckets) { b =>
        val n = grid.getOrElse((c, b), 0L)
        math.floor(math.log((n + 1).toDouble / (t + buckets)) * 1e6 + 0.5).toLong
      }
    }
    Model(classes, priors.toArray, weights.toArray)
  }

  /** `(lang_pred, best_micro)` as INLINE column expressions over any
    * text column — the no-join deploy form a composed pipeline gates
    * on (`withColumn`, not a classify-then-join). One codegen kernel
    * scores ALL classes in a single gram scan
    * ([[graft.functions.LangScoreExpr]]); the previous per-class
    * `aggregate`-HOF argmax fold was CodegenFallback (interpreted, no
    * subexpression elimination) and re-scanned the grams O(2^classes)
    * times per row — 24.3 s → ~1 s on the composed e2e key at sf0.1.
    * Identical semantics: same grams, same md5 bucket, same integer
    * micro-nat sums, same desc-score/asc-name argmax. */
  def scoreCols(textCol: Column, model: Model): (Column, Column) = {
    val s = graft.functions.LangScoreExpr(textCol, model.classes,
      model.priorsMicro.toSeq, model.weightsMicro.map(_.toSeq).toSeq)
    (s.getField("lang_pred"), s.getField("best_micro"))
  }

  /** Per-class micro-nat scores + argmax prediction as ONE narrow map:
    * `(…, lang_pred, best_micro)`. */
  def classify(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val (best, bestMicro) = scoreCols(col(textCol), model)
    df.select(col(idCol), best.as("lang_pred"), bestMicro.as("best_micro"))
  }

  // ---------------------------------------------------------- fixture

  /** md5-derived byte 0..255, the SQL-replayable value source. */
  private def m(s: String): Int = ImageDedup.md5Byte(s)

  /** Deterministic multilingual fixture text for `id` in class
    * `id % 4`: 40 words of 3–6 chars drawn from the class's 12-letter
    * alphabet (`'a' + 4c … 'a' + 4c + 11` — neighbours overlap by 8
    * letters, so discrimination needs the learned distribution, not a
    * disjoint-charset giveaway). Exactly replayable in SQL. */
  def fixtureText(id: Long): String = {
    val c = (id % 4).toInt
    (0 until 40).map { j =>
      val len = 3 + m(s"wl:$id:$j") % 4
      (0 until len).map(k => ('a' + 4 * c + m(s"ch:$id:$j:$k") % 12).toChar).mkString
    }.mkString(" ")
  }

  /** Fixture frame `(doc_id, lang_true, lang_label, text)`: the TRUE
    * class for every row, a training label only on `id % 8 < 4` (the
    * other half is held out — the accuracy gate measures
    * generalization; blocks of four keep every class in BOTH halves,
    * which an even/odd split would not: even ids are only classes
    * 0 and 2). */
  def fixtureTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val ids = docs.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    ids.mapPartitions(_.map { id =>
      val c = s"lng${id % 4}"
      (id, c, if (id % 8 < 4) c else null, fixtureText(id))
    })(Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING,
      Encoders.STRING))
      .toDF(idCol, "lang_true", "lang_label", "text")
  }
}
