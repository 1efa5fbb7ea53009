package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines — the
  * split/mix/cap operations every large-scale data build needs (an
  * EXTENSION beyond the reference surface, like [[Decontamination]]):
  * reproducible train/val/test assignment, per-domain mixture weighting,
  * and per-domain quota caps. All decisions derive from one primitive, a
  * salted md5 hash fraction, so membership is a pure function of
  * (id, salt) — stable across runs, cluster sizes, row order, and
  * engines (the DuckDB oracle replays it exactly), and changing the salt
  * re-rolls every assignment without touching data.
  *
  * Scale shape: [[splitColumn]] and [[mixtureKeep]] are stateless narrow
  * expressions — no shuffle, no state, they ride the scan stage of
  * whatever plan consumes them, so splitting or re-weighting 100 TB is a
  * single pass. [[quotaSample]] needs a per-group rank (one hash
  * shuffle); its pre-filter path bounds what enters that shuffle to
  * ~margin×quota rows per group instead of the whole corpus, with an
  * exact fallback for the (Chernoff-tail) case the pre-filter undershot.
  */
object CorpusSampling {

  /** Uniform-[0,1) hash fraction of (id, salt): the top 60 bits of
    * `md5(id + ":" + salt)` scaled by 2^-60. 60 bits keeps the integer
    * exact in a BIGINT on both engines; the final IEEE division is exact
    * scaling, so Spark and the SQL replay
    * (`('0x' || substring(md5(..),1,15))::BIGINT / 2^60`) agree
    * bit-for-bit.
    *
    * A NULL id yields a NULL fraction — `concat`, not `concat_ws`, so the
    * null PROPAGATES exactly like the SQL replay's `CAST(id AS VARCHAR)
    * || ':salt'` (r8 advice: concat_ws silently hashed a null id as just
    * the salt, parking every null id in one split while DuckDB's replay
    * fell to the CASE ELSE arm). Downstream semantics are now identical
    * on both engines: a Bernoulli keep-predicate is never true for a
    * null fraction, and a split CASE lands nulls in its ELSE arm. */
  def hashFraction(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(":" + salt))), 1, 15),
      16, 10).cast("bigint").cast("double") / lit(1152921504606846976.0)

  /** Split assignment: `splits` are (name, fraction) with fractions
    * summing to 1; a row lands in the first split whose cumulative
    * fraction exceeds its hash fraction. Deterministic per (id, salt) —
    * a document keeps its split across reruns and corpus growth (new ids
    * hash independently; existing ids never migrate). */
  def splitColumn(idCol: Column, salt: String, splits: Seq[(String, Double)]): Column = {
    require(splits.size >= 2, s"need >= 2 splits, got ${splits.size}")
    require(splits.forall(_._2 > 0.0), s"split fractions must be > 0: $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split fractions must sum to 1, got $total")
    val frac = hashFraction(idCol, salt)
    val cum = splits.init.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.init.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), bound)) =>
        val w = acc.fold(when(frac < bound, name))(_.when(frac < bound, name))
        Some(w)
    }.get.otherwise(splits.last._1)
  }

  /** Keep-decision for domain-weighted mixture sampling: a row survives
    * iff its hash fraction is below its domain's rate (`defaultRate` for
    * unlisted domains). Rates are exact at the population level the way
    * hash-mixture sampling always is — each row is an independent
    * deterministic Bernoulli(rate). */
  def mixtureKeep(idCol: Column, domainCol: Column, rates: Map[String, Double],
      defaultRate: Double, salt: String): Column = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1]: $rates default=$defaultRate")
    val frac = hashFraction(idCol, salt)
    def keep(rate: Double): Column =
      if (rate >= 1.0) lit(true) else if (rate <= 0.0) lit(false) else frac < rate
    rates.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (domain, rate)) =>
        val w = acc.fold(when(domainCol === domain, keep(rate)))(
          _.when(domainCol === domain, keep(rate)))
        Some(w)
    }.fold(keep(defaultRate))(_.otherwise(keep(defaultRate)))
  }

  /** Temperature-scaled mixture with multi-epoch oversampling — the
    * standard LM training-mixture builder (alpha-sampling: domain weight
    * ∝ n_d^(1/T), the multilingual-pretraining rebalance): hot domains
    * are downsampled, rare domains run MORE than one epoch.
    *
    * Per domain d with n_d rows, weight p_d = n_d^α / Σ_e n_e^α where
    * α = 1/temperature; the per-row sampling RATE is
    * `rate_d = budget · p_d / n_d` — and unlike [[mixtureKeep]] rates may
    * EXCEED 1: a row of an oversampled domain is emitted
    * `floor(rate_d)` times unconditionally (full epochs) plus one more
    * iff its hash fraction falls under the fractional remainder — a
    * deterministic with-repeat sample whose expected per-domain output is
    * exactly `budget · p_d`. Output rows carry an `epoch` column
    * (0-based) so downstream packing/shuffling can keep repeats apart.
    *
    * temperature = 1 reproduces proportional sampling (every rate equal);
    * temperature → ∞ approaches uniform domain weights. `budget` defaults
    * to the corpus row count (resample-to-same-size).
    *
    * Rates are rounded to 6 decimals BEFORE the epoch/keep arithmetic on
    * both engines — `pow` may differ in the last ulp between JVM libm and
    * DuckDB's, and the round guarantees the keep-predicate compares
    * identical doubles (same convention as the quality-score replays).
    *
    * Scale shape: one partial-aggregated domain count (O(#domains) rows),
    * a broadcast rate join (null-safe, so NULL domains sample like any
    * other group rather than silently dropping — the r8 null-key lesson),
    * then a narrow per-row explode of at most ceil(rate) copies. The
    * corpus is scanned once and never shuffled; determinism is per
    * (id, salt), independent of partitioning. */
  def temperatureMixture(df: DataFrame, idCol: String, domainCol: String,
      temperature: Double, salt: String,
      budget: Option[Long] = None): DataFrame = {
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    val alpha = 1.0 / temperature
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_n"))
    // O(#domains) rows: the pow-sum and corpus total ride one tiny agg
    val totals = counts.agg(
      sum(pow(col("_n").cast("double"), lit(alpha))).as("_powsum"),
      sum(col("_n")).as("_total"))
    val rates = counts.crossJoin(broadcast(totals)).select(
      col(domainCol).as("_dom"),
      round(
        budget.map(b => lit(b.toDouble)).getOrElse(col("_total").cast("double"))
          * pow(col("_n").cast("double"), lit(alpha)) / col("_powsum")
          / col("_n").cast("double"),
        6).as("_rate"))
    val frac = hashFraction(col(idCol), salt)
    df.join(broadcast(rates), col(domainCol) <=> col("_dom"))
      .filter(col("_rate") > 0.0)
      .withColumn("epoch",
        explode(sequence(lit(0L), ceil(col("_rate")).cast("long") - 1)))
      .filter(col("epoch") < floor(col("_rate")).cast("long") ||
        frac < col("_rate") - floor(col("_rate")))
      .drop("_dom", "_rate")
  }

  /** The `quota` rows of each group with the smallest (hash fraction,
    * id) — a deterministic uniform sample of at most `quota` per domain,
    * identical however the data is partitioned.
    *
    * `prefilterMargin = None` runs the plain windowed rank: one shuffle
    * on `groupCol`, exact, fine when groups fit a sort spill. At corpus
    * scale a popular domain is billions of rows, and ranking all of them
    * to keep `quota` wastes the whole shuffle — `Some(margin)` first
    * drops each row whose hash fraction exceeds
    * `margin * quota / |group|` (group sizes from one partial-aggregated
    * count), so only ~margin×quota rows per group enter the rank. The
    * pre-filter is lossless when at least `quota` rows survive it (the
    * quota smallest fractions are below any threshold that admits
    * `quota` rows); groups where the Binomial undershot — vanishingly
    * rare at margin 4, but checked, not assumed — are re-ranked
    * unfiltered. One bounded driver action inspects the per-group
    * shortfall (O(#domains) rows) to skip the fallback job entirely in
    * the common case. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String, quota: Int,
      salt: String, prefilterMargin: Option[Double] = None): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    val frac = hashFraction(col(idCol), salt)
    val w = Window.partitionBy(col(groupCol)).orderBy(frac.asc, col(idCol).asc)
    def ranked(in: DataFrame): DataFrame =
      in.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= quota).drop("_rn")
    prefilterMargin match {
      case None => ranked(df)
      case Some(margin) =>
        require(margin > 0.0, s"prefilterMargin must be > 0, got $margin")
        // NULL group keys never equi-join, so the rate join would silently
        // drop them while the margin-less path ranks them as one window
        // partition (r8 advice). Route null-keyed rows around the
        // prefilter into the exact ranked path and union at the end —
        // the two paths stay drop-in interchangeable on any input. When
        // the schema proves the key non-nullable the routing is skipped
        // outright (no extra scan subtree).
        val routeNulls = df.schema(groupCol).nullable
        val nullKeyed = if (routeNulls) df.filter(col(groupCol).isNull) else null
        val keyed = if (routeNulls) df.filter(col(groupCol).isNotNull) else df
        val counts = keyed.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
        val filtered = prefiltered(keyed, groupCol, counts, frac, quota, margin)
        val kept = ranked(filtered).localCheckpoint(false)
        // a group undershot iff the pre-filter admitted < quota rows of a
        // group it actually filtered (rate < 1 ⇔ |group| > margin*quota).
        // LEFT join from counts: a group the filter emptied ENTIRELY has
        // no kept row at all and must still be caught.
        val short = counts.filter(col("_n") > lit(margin * quota))
          .join(kept.groupBy(col(groupCol)).agg(count(lit(1)).as("_k")),
            Seq(groupCol), "left_outer")
          .filter(coalesce(col("_k"), lit(0L)) < quota)
          .select(col(groupCol))
        val shortGroups = short.collect().map(_.get(0))
        val out = if (shortGroups.isEmpty) kept
        else kept.filter(!col(groupCol).isInCollection(shortGroups.toSeq))
          .unionByName(ranked(
            keyed.filter(col(groupCol).isInCollection(shortGroups.toSeq))))
        // the rate join moved groupCol first; restore the input schema so
        // both paths are drop-in interchangeable
        val restored = out.select(df.columns.map(col).toIndexedSeq: _*)
        if (routeNulls) restored.unionByName(ranked(nullKeyed)) else restored
    }
  }

  /** The quota pre-filter stage (exposed for plan pinning): each row
    * survives iff its hash fraction is under its group's admission rate
    * `min(1, margin·quota/|group|)`. `counts` is O(#domains) and rides a
    * broadcast join, so the corpus itself is never shuffled here —
    * mirroring [[Decontamination]]'s small-side asymmetry. `frac < 1.0`
    * always holds, so rate-1.0 groups pass untouched. */
  private[graft] def prefiltered(df: DataFrame, groupCol: String,
      counts: DataFrame, frac: Column, quota: Int, margin: Double): DataFrame = {
    val rate = least(lit(1.0), lit(margin * quota) / col("_n").cast("double"))
    df.join(broadcast(counts.select(col(groupCol), rate.as("_rate"))), Seq(groupCol))
      .filter(frac < col("_rate")).drop("_rate")
  }

  /** Reproducible global training shuffle + shard assignment: every row
    * gets a salted hash key, a shard (`key-bits mod nShards` — NOT the
    * split fraction, so shard and any split/mixture salt stay
    * independent), and its 1-based position within the shard ordered by
    * (fraction, id). Loaders replay the exact epoch order from
    * (salt, nShards) alone — nothing is stored.
    *
    * Scale shape: the only non-narrow step is the per-shard position
    * window, which partitions by shard and sorts WITHIN shards —
    * `nShards` independent range-sorts of corpus/nShards rows each, the
    * same layout the loader consumes, with no global total order ever
    * materialized. A null id hashes to a null shard key — visibly
    * quarantined in its own partition rather than silently parked in
    * shard 0 (same propagation contract as [[hashFraction]]). */
  def shuffleShards(df: DataFrame, idCol: String, salt: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"need >= 1 shards, got $nShards")
    // an INDEPENDENT md5 field (hex chars 16..19) drives the shard so
    // that within-shard order (chars 1..15) is not correlated with shard
    // membership
    val shard = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + salt))), 16, 4), 16, 10).cast("bigint") % nShards
    val frac = hashFraction(col(idCol), salt)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_frac").asc, col(idCol).asc)
    df.select(col(idCol), shard.as("shard"), frac.as("_frac"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
