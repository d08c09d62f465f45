package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift statistics between two corpus snapshots.
  *
  * A 100 TB training-data pipeline re-crawls and re-filters continuously;
  * the cheap tripwire between snapshot N and N+1 is a drift score over a
  * numeric profile column (doc length, quality score, token count).
  * [[TextAnalysis.vocabularyDrift]] covers the token axis; this module
  * covers numeric columns with the Population Stability Index — the
  * standard monitoring score (PSI < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted) because it is symmetric, additive per bin, and
  * pinpoints WHICH bins moved.
  */
object Drift {

  /** PSI over `bins` fixed-width buckets of `[lo, hi)`.
    *
    * Per bin, with Laplace add-one smoothing so empty bins never divide
    * by zero (and the score stays finite — the standard practice):
    * {{{
    *   p(bin)    = (c(bin) + 1) / (N + bins)
    *   psi(bin)  = (p_a - p_b) · ln(p_a / p_b)      // always ≥ 0
    *   PSI       = Σ psi(bin)
    * }}}
    * Binning is exact integer math — `(v - lo)·bins DIV (hi - lo)`
    * clamped into [0, bins) so out-of-range values land in the edge
    * bins (a shifted tail still registers as drift, never as an error).
    * Keep `(hi - lo)·bins` AND `|v - lo|·bins` inside int64 (a value
    * near ±2^63 would wrap before the clamp and land in the wrong edge
    * bin; pre-clip such columns). Each per-bin term is ONE double
    * expression over exact long counts, floor-quantized to nano-units;
    * the total is an exact integer sum of those — bit-reproducible
    * across engines and partitionings (the [[TextAnalysis.tokenEntropy]]
    * trick).
    *
    * Scale shape: two map-side-combined count aggregates keyed on bin id
    * (≤ `bins` rows each — effectively free at any corpus size); every
    * downstream total (snapshot sizes, the PSI sum) is a global window
    * sum over that `bins`-row relation, so each corpus is scanned
    * exactly once and no shuffle grows with the data beyond the two
    * count exchanges.
    *
    * @param a snapshot A (e.g. last week's corpus)
    * @param b snapshot B (this week's)
    * @param valueCol integral column to profile (cast yourself if float)
    * @return (bin, c_a, c_b, psi_term, psi_total) — one row per bin,
    *         `psi_total` repeated on every row for one-relation output.
    */
  def psiFixedBins(a: DataFrame, b: DataFrame, valueCol: String,
                   lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    require(hi > lo, "hi must be > lo")
    val spark = a.sparkSession
    def binned(df: DataFrame, out: String): DataFrame = df
      .select(expr(
        s"least(greatest(($valueCol - ${lo}L) * $bins DIV ${hi - lo}L, 0L), ${bins - 1}L)")
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    val ca = binned(a, "c_a")
    val cb = binned(b, "c_b")
    val spine = spark.range(bins).select(col("id").as("bin"))
    // Everything after the two count exchanges is a ≤`bins`-row
    // relation, so the snapshot totals N and the final PSI sum both
    // come from GLOBAL WINDOW sums over it — each corpus is scanned
    // exactly ONCE (a scalar-aggregate + crossJoin shape would recompute
    // the count subtrees per consumer). The empty-frame window funnels
    // only `bins` rows through one partition — bounded by construction.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    // the identical double expression tree the oracle uses:
    // pa = (c+1)/(N+bins); term = floor((pa - pb) * ln(pa/pb) * 1e9)
    val terms = spine
      .join(ca, Seq("bin"), "left")
      .join(cb, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .withColumn("__na", sum("c_a").over(w))
      .withColumn("__nb", sum("c_b").over(w))
      .withColumn("__t", expr(
        s"""CAST(floor(
           |  ((CAST(c_a + 1 AS DOUBLE) / (CAST(__na AS DOUBLE) + $bins))
           |   - (CAST(c_b + 1 AS DOUBLE) / (CAST(__nb AS DOUBLE) + $bins)))
           |  * ln(
           |    (CAST(c_a + 1 AS DOUBLE) / (CAST(__na AS DOUBLE) + $bins))
           |    / (CAST(c_b + 1 AS DOUBLE) / (CAST(__nb AS DOUBLE) + $bins)))
           |  * 1e9) AS BIGINT)""".stripMargin))
    terms
      .withColumn("__tot", sum("__t").over(w))
      .select(col("bin"), col("c_a"), col("c_b"),
        round(col("__t").cast("double") / 1e9, 6).as("psi_term"),
        round(col("__tot").cast("double") / 1e9, 6).as("psi_total"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic over the same fixed-width
    * binning as [[psiFixedBins]] — the complementary drift score: PSI
    * weights every bin, KS is the worst-case CDF gap (sensitive to a
    * localized shift PSI smears out).
    *
    * EXACT integer arithmetic end to end: per bin,
    * `d_num = |cumA·NB − cumB·NA|` and `KS = max(d_num) / (NA·NB)` —
    * no smoothing, no logarithms, so the score is bit-identical across
    * engines with no quantization step at all (the one double is the
    * final division, mirrored and rounded to 6). Overflow bound:
    * `NA·NB < 2^63` — snapshots up to ~3e9 rows each; pre-aggregate or
    * sample above that. CONTRACT: both snapshots non-empty (an empty
    * side makes the final division 0/0, which the engines disagree on —
    * NaN vs NULL).
    *
    * Scale shape: identical to [[psiFixedBins]] — two O(bins) count
    * exchanges, then cumulative/global window sums over the bins-row
    * relation (single partition of `bins` rows by construction).
    *
    * @return (bin, c_a, c_b, d_num, ks) — `ks` repeated on every row.
    */
  def ksFixedBins(a: DataFrame, b: DataFrame, valueCol: String,
                  lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    require(hi > lo, "hi must be > lo")
    val spark = a.sparkSession
    def binned(df: DataFrame, out: String): DataFrame = df
      .select(expr(
        s"least(greatest(($valueCol - ${lo}L) * $bins DIV ${hi - lo}L, 0L), ${bins - 1}L)")
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    spark.range(bins).select(col("id").as("bin"))
      .join(binned(a, "c_a"), Seq("bin"), "left")
      .join(binned(b, "c_b"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .withColumn("__cum_a", sum("c_a").over(wCum))
      .withColumn("__cum_b", sum("c_b").over(wCum))
      .withColumn("__na", sum("c_a").over(wAll))
      .withColumn("__nb", sum("c_b").over(wAll))
      .withColumn("d_num", abs(col("__cum_a") * col("__nb") -
        col("__cum_b") * col("__na")))
      .withColumn("ks", round(
        max("d_num").over(wAll).cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double")), 6))
      .select(col("bin"), col("c_a"), col("c_b"), col("d_num"), col("ks"))
  }

  /** DuckDB oracle twin of [[ksFixedBins]] over relations `da`/`db`
    * with one integral column `v`. Emits bodies through `scored`;
    * caller selects (bin, c_a, c_b, d_num, ks). */
  def ksOracleCtes(lo: Long, hi: Long, bins: Int): String =
    s"""spine AS (SELECT unnest(range(0, $bins)) AS bin),
       |ca AS (SELECT least(greatest((v - $lo) * $bins // ${hi - lo}, 0), ${bins - 1}) AS bin,
       |         CAST(count(*) AS BIGINT) AS c FROM da GROUP BY 1),
       |cb AS (SELECT least(greatest((v - $lo) * $bins // ${hi - lo}, 0), ${bins - 1}) AS bin,
       |         CAST(count(*) AS BIGINT) AS c FROM db GROUP BY 1),
       |j AS (SELECT spine.bin,
       |    CAST(COALESCE(ca.c, 0) AS BIGINT) AS c_a,
       |    CAST(COALESCE(cb.c, 0) AS BIGINT) AS c_b
       |  FROM spine LEFT JOIN ca ON spine.bin = ca.bin
       |             LEFT JOIN cb ON spine.bin = cb.bin),
       |cum AS (SELECT bin, c_a, c_b,
       |    sum(c_a) OVER (ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
       |    sum(c_b) OVER (ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
       |    sum(c_a) OVER () AS na, sum(c_b) OVER () AS nb
       |  FROM j),
       |scored AS (SELECT bin, c_a, c_b,
       |    CAST(abs(cum_a * nb - cum_b * na) AS BIGINT) AS d_num,
       |    round(CAST(max(abs(cum_a * nb - cum_b * na)) OVER () AS DOUBLE)
       |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS ks
       |  FROM cum)""".stripMargin

  /** DuckDB oracle twin of [[psiFixedBins]] over two relations named
    * `da` and `db`, each exposing one integral column `v`. Emits
    * WITH-clause bodies through `scored`; the caller selects
    * (bin, c_a, c_b, psi_term, psi_total) from `scored`. */
  def psiOracleCtes(lo: Long, hi: Long, bins: Int): String =
    s"""spine AS (SELECT unnest(range(0, $bins)) AS bin),
       |ca AS (SELECT least(greatest((v - $lo) * $bins // ${hi - lo}, 0), ${bins - 1}) AS bin,
       |         CAST(count(*) AS BIGINT) AS c FROM da GROUP BY 1),
       |cb AS (SELECT least(greatest((v - $lo) * $bins // ${hi - lo}, 0), ${bins - 1}) AS bin,
       |         CAST(count(*) AS BIGINT) AS c FROM db GROUP BY 1),
       |na AS (SELECT COALESCE(sum(c), 0) AS n FROM ca),
       |nb AS (SELECT COALESCE(sum(c), 0) AS n FROM cb),
       |terms AS (SELECT spine.bin,
       |    CAST(COALESCE(ca.c, 0) AS BIGINT) AS c_a,
       |    CAST(COALESCE(cb.c, 0) AS BIGINT) AS c_b,
       |    CAST(floor(
       |      ((CAST(COALESCE(ca.c, 0) + 1 AS DOUBLE) / (CAST(na.n AS DOUBLE) + $bins))
       |       - (CAST(COALESCE(cb.c, 0) + 1 AS DOUBLE) / (CAST(nb.n AS DOUBLE) + $bins)))
       |      * ln(
       |        (CAST(COALESCE(ca.c, 0) + 1 AS DOUBLE) / (CAST(na.n AS DOUBLE) + $bins))
       |        / (CAST(COALESCE(cb.c, 0) + 1 AS DOUBLE) / (CAST(nb.n AS DOUBLE) + $bins)))
       |      * 1e9) AS BIGINT) AS t
       |  FROM spine LEFT JOIN ca ON spine.bin = ca.bin
       |             LEFT JOIN cb ON spine.bin = cb.bin
       |             CROSS JOIN na CROSS JOIN nb),
       |scored AS (SELECT bin, c_a, c_b,
       |    round(CAST(t AS DOUBLE) / 1e9, 6) AS psi_term,
       |    round(CAST((SELECT sum(t) FROM terms) AS DOUBLE) / 1e9, 6) AS psi_total
       |  FROM terms)""".stripMargin
}
