package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column null counts, exact distinct
  * counts, and min/max rendered to strings, in long format — the
  * data-quality sweep a pipeline runs before trusting a new drop.
  *
  * ONE aggregate over one scan computes every column's stats (the
  * per-column rows come from exploding a struct array over the single
  * aggregate row — not one scan per column). Exact distincts expand the
  * aggregate (one shuffle pass per distinct column internally via
  * Spark's EXPAND); swap mentally to approx_count_distinct when
  * profiling thousand-column tables at 100 TB — the seam is the same.
  *
  * Min/max cross-engine string caveat: double rendering differs between
  * engines (scientific-notation thresholds), so oracle-checked
  * profiles stick to integer/string columns; the operator itself
  * accepts any orderable column. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val a = df.agg(aggs.head, aggs.tail: _*)
    a.select(explode(array(cols.map(c => struct(
      lit(c).as("col_name"), col("__rows").as("n_rows"),
      col(s"__n_$c").as("n_nulls"), col(s"__d_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))): _*))
      .as("p"))
      .select("p.*")
  }

  /** Robust per-group outlier profile via the median/MAD rule: a value
    * is an outlier when |x − median| > k · 1.4826 · MAD (1.4826 scales
    * MAD to σ under normality — the standard robust z-score, immune to
    * the outliers themselves in a way mean/stddev rules are not). The
    * pre-filter sweep before trusting a metric column.
    *
    * Three keyed aggregates over the scan are inherent to exactness
    * (MAD needs the median first; the outlier count needs the MAD), but
    * each per-group stats relation is |groups|-sized and joins back
    * BROADCAST — the event stream itself is never shuffled, only
    * scanned (3×) and aggregated. Exact `percentile` holds a
    * value→count map per group; at 100 TB swap the seam to
    * `approx_percentile` (plan shape unchanged) or accept the map for
    * low-cardinality metric domains.
    *
    * @return one row per group: keys..., n, median, mad, n_outliers. */
  def robustOutliers(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     k: Double = 3.0,
                     approxAccuracy: Option[Int] = None): DataFrame = {
    require(keyCols.nonEmpty, "robustOutliers needs at least one key column")
    require(k > 0, s"k must be positive, got $k")
    require(approxAccuracy.forall(_ >= 100),
      s"approxAccuracy must be >= 100, got $approxAccuracy")
    // the scale seam: exact percentile holds every group's values; the
    // approx twin swaps in the bounded-memory GK sketch
    // (approx_percentile, rank error <= n/accuracy) for BOTH the median
    // and the MAD pass — the q_outliers_approx contract pins the drift
    // within tolerance on real data
    def med50(c: Column): Column = approxAccuracy match {
      case Some(acc) => approx_percentile(c, lit(0.5), lit(acc))
      case None => percentile(c, lit(0.5))
    }
    val keys = keyCols.map(col)
    val med = df.groupBy(keys: _*)
      .agg(med50(col(valueCol)).as("median"))
    val dev = df.join(broadcast(med), keyCols)
      .select(keys :+ col("median") :+
        abs(col(valueCol) - col("median")).as("__absdev"): _*)
    val mad = dev.groupBy(keys: _*)
      .agg(med50(col("__absdev")).as("mad"))
    dev.join(broadcast(mad), keyCols)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        first(col("median")).as("median"),
        first(col("mad")).as("mad"),
        sum(when(col("__absdev") > lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Binned calibration (reliability) report for a [0, 1] score column
    * against a boolean outcome: per equal-width bin, the mean predicted
    * score (confidence) vs the empirical positive rate (accuracy), and
    * the bin's weighted |gap| — whose sum over bins is the Expected
    * Calibration Error. The gate before trusting a quality-classifier
    * score as a keep/drop filter threshold.
    *
    * Engine-exact: scores accumulate as round(score·1e9) integer nanos
    * (order-independent exact sums — a naive avg(double) varies with
    * partition order), outcomes as 0/1 longs; each bin does ONE double
    * division at the end. ONE hash aggregate, map-side combined to
    * ≤ `bins` rows.
    *
    * @return (bin, n, confidence, accuracy, weighted_gap), bin ∈
    *         [0, bins): floor(score·bins) clamped into the edge bins
    *         (1.0 → bins−1; out-of-range scores pin to 0 / bins−1). */
  def calibrationReport(df: DataFrame, scoreCol: String, labelCol: String,
                        bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    // rows with a NULL score or label are EXCLUDED (a model abstention
    // is not a calibration sample — least/greatest skip nulls, so an
    // unfiltered null score would silently land in the top bin with a
    // null score-sum, deflating that bin's confidence); clamp BOTH
    // edges: score 1.0 folds into the top bin, and a stray
    // out-of-range score (unclipped logit) pins to an edge bin instead
    // of minting a bin -1 / bin > bins row that silently skews the ECE
    val binned = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
      greatest(least(floor(col(scoreCol) * bins), lit(bins - 1)), lit(0))
        .cast("long").as("bin"),
      round(col(scoreCol) * 1e9).cast("long").as("__s9"),
      col(labelCol).cast("boolean").cast("int").cast("long").as("__y"))
    val agg = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__s9").as("__ss"), sum("__y").as("__sy"))
    // single-partition window over the ≤ bins-row aggregate — constant
    // size regardless of input volume, not a corpus-wide funnel
    val total = sum(col("n"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    agg.select(col("bin"), col("n"),
      (col("__ss").cast("double") / col("n") / 1e9).as("confidence"),
      (col("__sy").cast("double") / col("n")).as("accuracy"),
      (abs(col("__ss").cast("double") / 1e9 - col("__sy").cast("double"))
        / total).as("weighted_gap"))
  }

  /** Cumulative gains / lift table: rank rows by model score
    * (descending), cut into `buckets` score-quantile bands, and report
    * per band the cumulative capture rate of positives (gain) and the
    * precision ratio vs the base rate (lift) — the "top decile catches
    * X% of the spam" report that decides where a classifier's filter
    * threshold goes.
    *
    * Band edges are EXACT score quantiles (one `percentile` aggregate,
    * broadcast back as a one-row literal frame), and each row's band is
    * a chain of score>edge indicator sums — so TIED scores always land
    * in the same band deterministically, where a global ntile() would
    * split ties by physical order AND funnel the corpus through one
    * partition. Bucket 1 is the TOP band. Corpus-side cost: one
    * aggregate + one broadcast-join projection; the cumulative/total
    * windows run single-partition over the ≤ `buckets`-row band table
    * ([[calibrationReport]]'s posture). Exact percentile buffers values
    * per aggregate — at 100 TB-scale swap `approxAccuracy` in
    * ([[robustOutliers]]'s documented seam; same plan, bounded memory,
    * no hash-exact oracle). NULL scores/labels are excluded (model
    * abstentions, as in calibrationReport). Ratios are mirrored
    * integer→double divisions; an all-negative input yields NULL gain/
    * lift rather than ±Inf.
    *
    * @return (bucket, n, n_pos, cum_n, cum_pos, gain, lift), bucket
    *         ascending = score descending. */
  def gainsTable(df: DataFrame, scoreCol: String, labelCol: String,
                 buckets: Int = 10,
                 approxAccuracy: Option[Int] = None): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val rows = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("boolean").cast("int").cast("long").as("__y"))
    def q(p: Double) = approxAccuracy match {
      case Some(acc) => percentile_approx(col("__s"), lit(p), lit(acc))
      case None => percentile(col("__s"), lit(p))
    }
    val cuts = rows.agg(
      q(1.0 / buckets).as("__c0"),
      (2 until buckets).map(i => q(i.toDouble / buckets).as(s"__c${i - 1}")): _*)
    // ascending band = 1 + #(edges strictly below the score); bucket 1
    // must be the TOP band, so flip. Strictly-below keeps every tied
    // score in one band regardless of row order.
    val asc = (0 until buckets - 1)
      .map(i => when(col("__s") > col(s"__c$i"), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    val banded = rows.crossJoin(broadcast(cuts))
      .select((lit(buckets + 1) - asc).as("bucket"), col("__y"))
    val agg = banded.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    // single-partition windows over the ≤ buckets-row band table
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val cumN = sum(col("n")).over(wCum)
    val cumPos = sum(col("n_pos")).over(wCum)
    val totN = sum(col("n")).over(wAll)
    val totPos = sum(col("n_pos")).over(wAll)
    agg.select(col("bucket"), col("n"), col("n_pos"),
      cumN.as("cum_n"), cumPos.as("cum_pos"),
      when(totPos > 0, cumPos.cast("double") / totPos).as("gain"),
      when(totPos > 0, (cumPos.cast("double") / cumN) /
        (totPos.cast("double") / totN)).as("lift"))
  }

  /** Functional-dependency check over candidate column pairs: for each
    * (lhs → rhs), does every lhs value map to exactly one rhs value?
    * The schema-discovery / data-contract sweep that tells you which
    * columns are safe normalization keys, which "id" columns are lying,
    * and where a denormalized feed drifted.
    *
    * Pairs FUSE by their lhs: every pair sharing a determinant runs in
    * ONE groupBy on that lhs (map-side combined, shuffle bounded by lhs
    * cardinality) counting distinct rhs for ALL its dependents at once,
    * then one 1-row summary per pair — n_groups, how many groups violate
    * (>1 distinct rhs), the worst fan-out, and the verdict. Distinct
    * determinants are independent aggregates unioned together; nulls
    * follow SQL semantics (a null lhs is its own group, null rhs values
    * don't count as witnesses).
    *
    * At 100 TB this is |distinct lhs columns| scans — checking one key
    * column against k dependents costs ONE pass, and candidate pairs
    * are a schema-sized, human-chosen list, not an O(cols²) sweep; for
    * the exhaustive version run this over a sampled partition first.
    *
    * @return one row per pair IN INPUT ORDER: (lhs, rhs, n_groups,
    *         n_violations, max_fanout, holds). */
  def functionalDeps(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "functionalDeps needs at least one (lhs, rhs) pair")
    // stable grouping: determinants in first-appearance order, each
    // dependent list in input order, so the output row order is the
    // caller's pair order (grouped by lhs)
    val byLhs = pairs.map(_._1).distinct.map(a =>
      a -> pairs.collect { case (`a`, b) => b })
    byLhs.map { case (a, bs) =>
      val grouped = df.groupBy(col(a))
        .agg(countDistinct(col(bs.head)).as(s"__k0"),
          bs.tail.zipWithIndex.map { case (b, i) =>
            countDistinct(col(b)).as(s"__k${i + 1}") }: _*)
      // coalesce: on an EMPTY relation the group-less aggregate still
      // emits one row, and sum/max are NULL — report 0 violations over
      // 0 groups (the dependency vacuously holds), not NULLs
      val summary = grouped.agg(
        count(lit(1)).as("n_groups"),
        bs.indices.flatMap { i =>
          Seq(coalesce(sum(when(col(s"__k$i") > 1, 1L).otherwise(0L)),
              lit(0L)).as(s"__v$i"),
            coalesce(max(col(s"__k$i")), lit(0L)).as(s"__f$i"))
        }: _*)
      // one row per dependent via explode over the single summary row —
      // a union of per-pair selects would DUPLICATE the aggregate
      // subtree (scan included) once per dependent
      summary.select(explode(array(bs.zipWithIndex.map { case (b, i) =>
          struct(lit(a).as("lhs"), lit(b).as("rhs"), col("n_groups"),
            col(s"__v$i").as("n_violations"),
            col(s"__f$i").as("max_fanout"),
            (col(s"__v$i") === 0).as("holds"))
        }: _*)).as("__r"))
        .select("__r.*")
    }.reduce(_ unionAll _)
  }

  /** [[functionalDeps]] as DuckDB SQL over `relation` — same per-pair
    * aggregate, UNION ALL'd in pair order. */
  def functionalDepsOracleSql(relation: String,
                              pairs: Seq[(String, String)]): String =
    pairs.map { case (a, b) =>
      s"""SELECT '$a' AS lhs, '$b' AS rhs, count(*) AS n_groups,
         |  CAST(coalesce(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_violations,
         |  coalesce(max(k), 0) AS max_fanout,
         |  coalesce(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0) = 0 AS holds
         |FROM (SELECT count(DISTINCT $b) AS k FROM $relation GROUP BY $a)"""
        .stripMargin
    }.mkString("", "\nUNION ALL\n", "")

  /** Gini coefficient (2·AUC − 1) of a [[gainsTable]] curve — the
    * single-number ranking-power summary behind "is this quality
    * classifier worth filtering on": 0 = random ordering, →1 = perfect
    * separation at this banding granularity (the trapezoid over band
    * points UNDERSTATES the exact per-row AUC — comparable across
    * models only at the same `buckets`). Pure arithmetic over the
    * ≤ buckets-row band table: one lag window + one aggregate, all
    * single-partition model-sized; NULL when the input had no
    * positives (gain is NULL). */
  def giniFromGains(gains: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val x = col("cum_n").cast("double") / max(col("cum_n")).over(wAll)
    val staged = gains.select(col("bucket"), x.as("__x"), col("gain").as("__y"))
    staged
      .select(col("__x"), col("__y"),
        coalesce(lag(col("__x"), 1).over(w), lit(0.0)).as("__px"),
        coalesce(lag(col("__y"), 1).over(w), lit(0.0)).as("__py"))
      .agg(sum((col("__x") - col("__px")) * (col("__y") + col("__py")) / 2)
        .as("__auc"))
      .select((lit(2.0) * col("__auc") - 1.0).as("gini"))
  }

  /** Snapshot-over-snapshot profile drift: [[profile]] both sides (ONE
    * aggregate scan each), join the two schema-sized long-format
    * profiles by column, and report the deltas a data-contract review
    * reads — null-rate movement, distinct-count movement, and whether
    * the [min, max] envelope moved (null-safe: an empty side is a drift
    * signal, not a NULL that vanishes from the report). The
    * quantitative companion to [[functionalDeps]]'s structural checks
    * and vocabularyDrift's content check: run it between daily drops
    * before trusting a feed. Corpus cost = two profile scans; the join
    * is |cols|-row. */
  def profileDrift(oldDf: DataFrame, newDf: DataFrame,
                   cols: Seq[String]): DataFrame = {
    val o = profile(oldDf, cols)
    val n = profile(newDf, cols)
    o.as("o").join(n.as("n"), Seq("col_name"))
      .select(col("col_name"),
        col("o.n_rows").as("old_rows"), col("n.n_rows").as("new_rows"),
        col("o.n_nulls").as("old_nulls"), col("n.n_nulls").as("new_nulls"),
        col("o.n_distinct").as("old_distinct"),
        col("n.n_distinct").as("new_distinct"),
        round(col("n.n_nulls").cast("double") / col("n.n_rows")
          - col("o.n_nulls").cast("double") / col("o.n_rows"), 9)
          .as("null_rate_delta"),
        (!(col("o.min_value") <=> col("n.min_value")) ||
          !(col("o.max_value") <=> col("n.max_value"))).as("range_drifted"))
  }

  /** Per-group success rate with the Wilson score interval (Wilson
    * 1927) — the binomial CI that stays inside [0, 1] and behaves at
    * small n / extreme rates where the normal approximation collapses;
    * what a ranking or experiment readout should sort by instead of the
    * raw rate (lower bound = pessimistic rate, the standard
    * "sort by Wilson LB" comparator). Rows with a NULL success flag are
    * excluded (no trial). ONE grouped integer aggregate; the interval
    * is closed-form arithmetic on (n, s) — deterministic, engine-exact
    * modulo the final double ops, which both engines evaluate from the
    * same expression tree. Output: (groups..., n, n_success, rate,
    * wilson_lo, wilson_hi). */
  def wilsonRates(df: DataFrame, groupCols: Seq[String],
                  successCol: String, z: Double = 1.96): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(z > 0, s"z must be positive, got $z")
    val s = col(successCol).cast("boolean")
    val base = df.where(s.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(s, 1L).otherwise(0L)), lit(0L)).as("n_success"))
    val nD = col("n").cast("double")
    val p = col("n_success").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))) / denom
    base.withColumn("rate", p)
      .withColumn("wilson_lo", center - half)
      .withColumn("wilson_hi", center + half)
  }

  /** [[profile]] as DuckDB SQL over `relation` for the given columns
    * (integer/string columns only — see the rendering caveat above). */
  /** Welch's unequal-variance t-test between every pair of groups —
    * the segment-comparison readout behind "did source A's quality
    * scores really shift vs source B" (no pooled-variance assumption,
    * so heteroscedastic segments compare honestly). Emits the t
    * statistic and Welch–Satterthwaite df; significance thresholds are
    * the caller's (no CDF seam in-engine).
    *
    * Scale shape: ONE grouped integer aggregate over the corpus
    * (per-row values nano-quantize to longs, moments sum exactly in
    * decimal(38,0) — the [[Sampling.neymanSample]] recipe), then the
    * pairwise algebra runs on the model-sized group relation (a
    * |groups|² cross of one-row stats, never of data). Double math is
    * the identical IEEE sequence both engines; groups need n ≥ 2.
    *
    * Output: (group_a, group_b, n_a, n_b, mean_diff, t_stat, welch_df),
    * pairs with group_a < group_b. */
  def welchTTest(df: DataFrame, groupCol: String,
                 valueCol: String): DataFrame = {
    val q = floor(col(valueCol).cast("double") * lit(1e9)).cast("long")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val stats = df
      .select(col(groupCol).cast("string").as("__g"), q.as("__q"))
      .groupBy("__g")
      .agg(count(lit(1)).as("__n"), sum(d38(col("__q"))).as("__sv"),
        sum(d38(col("__q")) * d38(col("__q"))).as("__sv2"))
      .where(col("__n") >= 2)
      .select(col("__g"), col("__n"),
        (col("__sv").cast("double") /
          (col("__n").cast("double") * lit(1e9))).as("__mean"),
        ((d38(col("__n")) * col("__sv2") - col("__sv") * col("__sv"))
          .cast("double") /
          ((col("__n").cast("double") * (col("__n") - 1).cast("double")) *
            lit(1e18))).as("__s2"))
    val a = stats.select(col("__g").as("group_a"), col("__n").as("n_a"),
      col("__mean").as("__ma"), col("__s2").as("__va"))
    val b = stats.select(col("__g").as("group_b"), col("__n").as("n_b"),
      col("__mean").as("__mb"), col("__s2").as("__vb"))
    val se2a = col("__va") / col("n_a").cast("double")
    val se2b = col("__vb") / col("n_b").cast("double")
    a.join(b, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        (col("__ma") - col("__mb")).as("mean_diff"),
        // two constant groups → zero standard error: neither engine's
        // division-by-zero default may reach the output (the
        // bleuCorpus rule), so the statistic is NULL (undefined)
        when(se2a + se2b > 0,
          (col("__ma") - col("__mb")) / sqrt(se2a + se2b)).as("t_stat"),
        when(se2a + se2b > 0,
          (se2a + se2b) * (se2a + se2b) /
            (se2a * se2a / (col("n_a") - 1).cast("double") +
              se2b * se2b / (col("n_b") - 1).cast("double")))
          .as("welch_df"))
  }

  /** [[welchTTest]] as DuckDB SQL: the identical quantized moments
    * (HUGEINT exact), the identical double sequence. */
  def welchTTestOracleSql(relation: String, groupExpr: String,
                          valueExpr: String): String =
    s"""WITH r AS (SELECT CAST($groupExpr AS VARCHAR) AS g,
       |    CAST(floor(CAST($valueExpr AS DOUBLE) * 1e9) AS BIGINT) AS q
       |  FROM $relation),
       |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(q AS HUGEINT)) AS sv,
       |    sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS sv2
       |  FROM r GROUP BY g HAVING count(*) >= 2),
       |m AS (SELECT g, n,
       |    CAST(sv AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) AS mean,
       |    CAST(CAST(n AS HUGEINT) * sv2 - sv * sv AS DOUBLE)
       |      / ((CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) * 1e18) AS s2
       |  FROM st)
       |SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a, b.n AS n_b,
       |  a.mean - b.mean AS mean_diff,
       |  CASE WHEN a.s2 / CAST(a.n AS DOUBLE)
       |      + b.s2 / CAST(b.n AS DOUBLE) > 0 THEN
       |    (a.mean - b.mean) / sqrt(a.s2 / CAST(a.n AS DOUBLE)
       |      + b.s2 / CAST(b.n AS DOUBLE)) END AS t_stat,
       |  CASE WHEN a.s2 / CAST(a.n AS DOUBLE)
       |      + b.s2 / CAST(b.n AS DOUBLE) > 0 THEN
       |    (a.s2 / CAST(a.n AS DOUBLE) + b.s2 / CAST(b.n AS DOUBLE))
       |    * (a.s2 / CAST(a.n AS DOUBLE) + b.s2 / CAST(b.n AS DOUBLE))
       |    / (a.s2 / CAST(a.n AS DOUBLE) * (a.s2 / CAST(a.n AS DOUBLE))
       |        / CAST(a.n - 1 AS DOUBLE)
       |      + b.s2 / CAST(b.n AS DOUBLE) * (b.s2 / CAST(b.n AS DOUBLE))
       |        / CAST(b.n - 1 AS DOUBLE)) END AS welch_df
       |FROM m a JOIN m b ON a.g < b.g""".stripMargin

  /** One-vs-rest Mann–Whitney U over FIXED-BIN midranks — the
    * nonparametric complement of [[welchTTest]]: does group g's value
    * distribution stochastically dominate the rest of the corpus,
    * without any normality assumption. Values bin to `bins` equal
    * widths over [lo, hi) first (the [[Drift.ksFixedBins]] convention:
    * binning is part of the statistic's definition, making every rank a
    * midrank over an occupancy count — integer-exact, order-invariant,
    * and scale-safe: the only corpus-sized step is ONE (group, bin)
    * count aggregate; ranks/ties/U all compute on the model-sized bin
    * relation, with the massive-tie correction the midrank form
    * requires built in).
    *
    * Integer plumbing: twice-the-midrank r2(b) = 2·cnt_less + cnt_b + 1
    * keeps everything in longs; tie mass Σ(t³−t) and Σc·r2 accumulate
    * in decimal(38,0) (corpus-scale-safe); U and the tie-corrected
    * normal z divide once at the end in a pinned IEEE order.
    *
    * Output: (groupCol, n, u, z) — U for group-vs-rest and its
    * asymptotic z score. */
  def mannWhitneyBinned(df: DataFrame, groupCol: String, valueCol: String,
                        lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 65536, s"bins must be in [2,65536]")
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / bins
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol).cast("double") - lit(lo)) / lit(w)).cast("int")))
    val cgb = df.select(col(groupCol).cast("string").as("__g"),
        bin.as("__b"))
      .groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
    val wCum = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    // model-sized from here down: ≤ bins rows, then ≤ |groups| rows
    val binStats = cgb.groupBy("__b").agg(sum("__c").as("__cb"))
      .select(col("__b"), col("__cb"),
        (sum(col("__cb")).over(wCum) - col("__cb")).as("__less"),
        sum(col("__cb")).over(wAll).as("__n"),
        sum(d38(col("__cb")) * d38(col("__cb")) * d38(col("__cb")) -
          d38(col("__cb"))).over(wAll).as("__tmass"))
      .select(col("__b"), col("__n"), col("__tmass"),
        (lit(2L) * col("__less") + col("__cb") + 1).as("__r2"))
    cgb.join(binStats, "__b")
      .groupBy("__g")
      .agg(sum("__c").as("n"),
        sum(d38(col("__c")) * d38(col("__r2"))).as("__sr2"),
        first(col("__n")).as("__N"), first(col("__tmass")).as("__T"))
      .select(col("__g").as(groupCol), col("n"),
        ((col("__sr2") - d38(col("n")) * d38(col("n") + 1))
          .cast("double") / lit(2.0)).as("u"),
        {
          // degenerate margins (group = whole corpus, or every value in
          // one bin → tie mass cancels the variance) zero the z
          // denominator: NULL, not NaN/Inf (the bleuCorpus rule)
          val varArg = (col("n").cast("double") *
            (col("__N") - col("n")).cast("double") / lit(12.0)) *
            ((col("__N") + 1).cast("double") -
              col("__T").cast("double") /
                (col("__N").cast("double") *
                  (col("__N") - 1).cast("double")))
          when(col("n") < col("__N") && varArg > 0,
            (col("__sr2") - d38(col("n")) * d38(col("n") + 1) -
              d38(col("n")) * d38(col("__N") - col("n"))).cast("double") /
              lit(2.0) / sqrt(varArg)).as("z")
        })
  }

  /** [[mannWhitneyBinned]] as DuckDB SQL — identical binning, midranks,
    * HUGEINT tie mass, and IEEE division order. */
  def mannWhitneyOracleSql(relation: String, groupExpr: String,
                           valueExpr: String, lo: Double, hi: Double,
                           bins: Int, groupAlias: String = "g"): String = {
    val w = (hi - lo) / bins
    s"""WITH r AS (SELECT CAST($groupExpr AS VARCHAR) AS g,
       |    LEAST(${bins - 1}, GREATEST(0, CAST(floor(
       |      (CAST($valueExpr AS DOUBLE) - ($lo)) / $w) AS INT))) AS b
       |  FROM $relation),
       |cgb AS (SELECT g, b, CAST(count(*) AS BIGINT) AS c FROM r
       |  GROUP BY g, b),
       |bs0 AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cgb GROUP BY b),
       |bs AS (SELECT b,
       |    CAST(sum(cb) OVER (ORDER BY b) - cb AS BIGINT) AS less,
       |    CAST(sum(cb) OVER () AS BIGINT) AS n,
       |    sum(CAST(cb AS HUGEINT) * CAST(cb AS HUGEINT) * CAST(cb AS
       |      HUGEINT) - CAST(cb AS HUGEINT)) OVER () AS tmass,
       |    2 * (sum(cb) OVER (ORDER BY b) - cb) + cb + 1 AS r2
       |  FROM bs0),
       |gs AS (SELECT cgb.g, CAST(sum(cgb.c) AS BIGINT) AS n,
       |    sum(CAST(cgb.c AS HUGEINT) * CAST(bs.r2 AS HUGEINT)) AS sr2,
       |    any_value(bs.n) AS nn, any_value(bs.tmass) AS t
       |  FROM cgb JOIN bs USING (b) GROUP BY cgb.g)
       |SELECT g AS $groupAlias, n,
       |  CAST(sr2 - CAST(n AS HUGEINT) * CAST(n + 1 AS HUGEINT)
       |    AS DOUBLE) / 2.0 AS u,
       |  CASE WHEN n < nn
       |      AND (CAST(n AS DOUBLE) * CAST(nn - n AS DOUBLE) / 12.0)
       |        * (CAST(nn + 1 AS DOUBLE)
       |          - CAST(t AS DOUBLE)
       |            / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))) > 0
       |    THEN
       |  CAST(sr2 - CAST(n AS HUGEINT) * CAST(n + 1 AS HUGEINT)
       |      - CAST(n AS HUGEINT) * CAST(nn - n AS HUGEINT) AS DOUBLE)
       |    / 2.0
       |    / sqrt((CAST(n AS DOUBLE) * CAST(nn - n AS DOUBLE) / 12.0)
       |      * (CAST(nn + 1 AS DOUBLE)
       |        - CAST(t AS DOUBLE)
       |          / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))))
       |  END AS z
       |FROM gs""".stripMargin
  }

  /** Cramér's V association between two categorical columns — the
    * contingency-table effect size behind "are these two labels
    * redundant" (feature dedup / leakage screening), completing the
    * association family next to [[functionalDeps]] (exact implication)
    * and chi² token scoring. ONE grouped count aggregate over the
    * corpus; the χ² fold runs on the DENSIFIED model-sized cell
    * relation (distinct-A × distinct-B left-joined to counts — zero
    * cells contribute their full expectation, dropping them understates
    * χ²), with each cell's term nano-quantized to a long before the
    * sum (order-invariant; the tokenEntropy recipe). Output one row:
    * (n, rows, cols, chi2, v). */
  def cramersV(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.select(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__n"))
    val ra = cells.groupBy("__a").agg(sum("__n").as("__ra"))
    val cb = cells.groupBy("__b").agg(sum("__n").as("__cb"))
    val dense = ra.crossJoin(cb)
      .join(cells, Seq("__a", "__b"), "left")
      .select(col("__ra"), col("__cb"),
        coalesce(col("__n"), lit(0L)).as("__o"))
    val tot = cells.agg(sum("__n").as("__N"),
      countDistinct(col("__a")).as("__R"),
      countDistinct(col("__b")).as("__C"))
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("__N").cast("double")
    val term = (col("__o").cast("double") - e) *
      (col("__o").cast("double") - e) / e
    dense.crossJoin(broadcast(tot))
      .agg(first(col("__N")).as("n"), first(col("__R")).as("rows"),
        first(col("__C")).as("cols"),
        sum(floor(term * lit(1e9)).cast("long")).as("__q"))
      .select(col("n"), col("rows"), col("cols"),
        (col("__q").cast("double") / lit(1e9)).as("chi2"),
        // min(R,C)=1 makes the denominator 0 — Spark would emit NaN/Inf
        // while DuckDB's behavior depends on ieee_floating_point_ops;
        // neither engine's division-by-zero default may reach the
        // output, so a single-valued margin yields NULL (V undefined).
        when(least(col("rows"), col("cols")) > 1,
          sqrt((col("__q").cast("double") / lit(1e9)) /
            (col("n").cast("double") *
              (least(col("rows"), col("cols")) - 1).cast("double"))))
          .as("v"))
  }

  /** [[cramersV]] as DuckDB SQL — identical densification, expectation
    * and quantized χ² fold. */
  def cramersVOracleSql(relation: String, aExpr: String,
                        bExpr: String): String =
    s"""WITH cells AS (SELECT CAST($aExpr AS VARCHAR) AS a,
       |    CAST($bExpr AS VARCHAR) AS b, CAST(count(*) AS BIGINT) AS n
       |  FROM $relation GROUP BY a, b),
       |ra AS (SELECT a, CAST(sum(n) AS BIGINT) AS ra FROM cells
       |  GROUP BY a),
       |cb AS (SELECT b, CAST(sum(n) AS BIGINT) AS cb FROM cells
       |  GROUP BY b),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
       |    CAST(count(DISTINCT a) AS BIGINT) AS r,
       |    CAST(count(DISTINCT b) AS BIGINT) AS c FROM cells),
       |dense AS (SELECT ra.ra, cb.cb, COALESCE(cells.n, 0) AS o
       |  FROM ra CROSS JOIN cb
       |  LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b),
       |folded AS (SELECT
       |    CAST(sum(CAST(floor(
       |      (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
       |        / CAST(nn AS DOUBLE))
       |      * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS
       |        DOUBLE) / CAST(nn AS DOUBLE))
       |      / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
       |        / CAST(nn AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS q
       |  FROM dense, tot)
       |SELECT nn AS n, r AS rows, c AS cols,
       |  CAST(q AS DOUBLE) / 1e9 AS chi2,
       |  CASE WHEN least(r, c) > 1 THEN
       |    sqrt((CAST(q AS DOUBLE) / 1e9)
       |      / (CAST(nn AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE)))
       |  ELSE NULL END AS v
       |FROM folded, tot""".stripMargin

  def profileOracleSql(relation: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value FROM $relation""".stripMargin
    }.mkString("", "\nUNION ALL\n", "")
}
