package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering transforms for tabular model prep: weight of
  * evidence / information value screening and leakage-safe target
  * encoding. Everything here derives features from integer-exact
  * grouped counts, so results are deterministic across partitionings,
  * runs, and engines — the property that makes a feature pipeline
  * reproducible enough to audit. */
object FeatureEng {

  /** Weight-of-evidence table per category of a feature against a
    * binary label, with each category's information-value term —
    * the classic credit-scoring screen (Siddiqi 2006) for "does this
    * categorical carry signal, and which levels carry it":
    *   woe(c)  = ln(dist_pos(c) / dist_neg(c)),
    *   iv(c)   = (dist_pos(c) − dist_neg(c)) · woe(c),  IV = Σ iv(c)
    * with the standard +0.5 cell smoothing (dist = (count + 0.5) /
    * total) so empty cells stay finite instead of ±∞. Rows with a NULL
    * label are excluded (no evidence either way); a NULL category is
    * its own level (GROUP BY semantics).
    *
    * Shape: ONE grouped integer-count aggregate over the category key,
    * with the two totals riding a one-row broadcast back over the
    * |categories|-sized table — corpus touched once, no window. Output:
    * (category col, n, n_pos, n_neg, woe, iv). */
  def woeTable(df: DataFrame, featureCol: String, labelCol: String): DataFrame = {
    val counts = df.where(col(labelCol).isNotNull)
      .groupBy(col(featureCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)),
          lit(0L)).as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val totals = counts.agg(sum(col("n_pos")).as("__tp"),
      sum(col("n_neg")).as("__tn"))
    counts.crossJoin(broadcast(totals))
      .withColumn("__dp",
        (col("n_pos").cast("double") + 0.5) / col("__tp").cast("double"))
      .withColumn("__dn",
        (col("n_neg").cast("double") + 0.5) / col("__tn").cast("double"))
      .withColumn("woe", log(col("__dp") / col("__dn")))
      .withColumn("iv", (col("__dp") - col("__dn")) * col("woe"))
      .drop("__tp", "__tn", "__dp", "__dn")
  }

  /** [[woeTable]] as DuckDB SQL over `relation`; `feature`/`label` are
    * raw SQL expressions, `label` boolean-valued. Caller appends ORDER
    * BY on the feature alias `cat`. */
  def woeOracleSql(relation: String, feature: String, label: String): String =
    s"""WITH c AS (SELECT $feature AS cat, count(*) AS n,
       |    CAST(COALESCE(sum(CASE WHEN $label THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS n_pos
       |  FROM $relation WHERE ($label) IS NOT NULL GROUP BY 1),
       |t AS (SELECT sum(n_pos) AS tp, sum(n - n_pos) AS tn FROM c)
       |SELECT cat, n, n_pos, n - n_pos AS n_neg,
       |  ln(((CAST(n_pos AS DOUBLE) + 0.5) / tp) /
       |     ((CAST(n - n_pos AS DOUBLE) + 0.5) / tn)) AS woe,
       |  (((CAST(n_pos AS DOUBLE) + 0.5) / tp) -
       |   ((CAST(n - n_pos AS DOUBLE) + 0.5) / tn)) *
       |  ln(((CAST(n_pos AS DOUBLE) + 0.5) / tp) /
       |     ((CAST(n - n_pos AS DOUBLE) + 0.5) / tn)) AS iv
       |FROM c, t""".stripMargin

  /** Leave-one-out smoothed target encoding: each row's category mean
    * of a binary target, EXCLUDING the row itself and shrunk toward the
    * global prior —
    *   te = (sum_y(cat) − y_row + prior·m) / (n(cat) − 1 + m)
    * (Micci-Barreca 2001's empirical-Bayes form with LOO, the standard
    * guard against the target leaking through its own row). A
    * singleton category with m = 0 would be 0/0 → the smoothing weight
    * `m` must be positive, which also makes the encoding defined
    * everywhere. NULL-label rows get the prior-only encoding (their own
    * y is unknown, so nothing is subtracted and they contribute nothing
    * to the sums).
    *
    * Shape: one grouped integer aggregate over the category (sum_y, n),
    * one broadcast of the two-scalar prior, one id-keyed join back —
    * NOT a window over the category (a handful of category values would
    * funnel the corpus into |categories| tasks). Integer sums keep the
    * encoding engine-exact. */
  def targetEncode(df: DataFrame, featureCol: String, labelCol: String,
                   m: Double, outCol: String = "te"): DataFrame = {
    require(m > 0, s"smoothing weight m must be positive, got $m")
    val y = when(col(labelCol).cast("boolean"), 1L)
      .when(!col(labelCol).cast("boolean"), 0L)
    val stats = df.groupBy(col(featureCol).as("__cat"))
      .agg(coalesce(sum(y), lit(0L)).as("__sy"),
        count(y).as("__ny"))
    val prior = df.agg(
      (coalesce(sum(y), lit(0L)).cast("double") /
        greatest(count(y), lit(1L)).cast("double")).as("__prior"))
    df.join(stats, col(featureCol) <=> col("__cat"), "left")
      .crossJoin(broadcast(prior))
      .withColumn(outCol,
        (col("__sy").cast("double") - coalesce(y, lit(0L)).cast("double")
          + col("__prior") * m) /
        ((col("__ny") - when(y.isNotNull, 1L).otherwise(0L)).cast("double")
          + m))
      .drop("__cat", "__sy", "__ny", "__prior")
  }

  /** [[targetEncode]] as DuckDB SQL over `relation` with an `id` order
    * column exposed; `feature`/`label` raw SQL exprs, label boolean. */
  def targetEncodeOracleSql(relation: String, id: String, feature: String,
                            label: String, m: Double): String =
    s"""WITH b AS (SELECT $id AS id, $feature AS cat,
       |    CASE WHEN $label THEN 1 WHEN NOT ($label) THEN 0 END AS y
       |  FROM $relation),
       |s AS (SELECT cat, CAST(COALESCE(sum(y), 0) AS BIGINT) AS sy,
       |    count(y) AS ny FROM b GROUP BY cat),
       |p AS (SELECT CAST(COALESCE(sum(y), 0) AS DOUBLE) /
       |    greatest(count(y), 1) AS prior FROM b)
       |SELECT b.id, b.cat,
       |  (CAST(sy AS DOUBLE) - COALESCE(y, 0) + prior * $m) /
       |  (CAST(ny - (CASE WHEN y IS NOT NULL THEN 1 ELSE 0 END)
       |     AS DOUBLE) + $m) AS te
       |FROM b JOIN s ON b.cat IS NOT DISTINCT FROM s.cat, p""".stripMargin

  /** Cross-group quantile normalization (fixed-bin histogram
    * equalization) — scores from heterogeneous sources are not
    * comparable (classifier A's 0.7 ≠ classifier B's 0.7; one domain's
    * length distribution ≠ another's), so mixing or thresholding them
    * jointly first maps EACH group's distribution onto the POOLED one:
    * a row's normalized value is the pooled-distribution bin midpoint
    * at its group-relative CDF position.
    *
    * Binned formulation (the [[Drift.ksFixedBins]] convention: the
    * binning IS part of the statistic): per (group, bin) cumulative
    * counts give the group CDF, pooled cumulative counts give the
    * pooled inverse CDF, and a row in (g, b) maps to the FIRST pooled
    * bin p with `pooledCum_p · n_g ≥ groupCum_gb · N` — an exact
    * integer cross-multiplication (decimal(38,0)/HUGEINT, corpus-safe),
    * zero doubles until the final midpoint arithmetic, so the map is
    * bit-identical across engines and partitionings. The inequality
    * always has a solution (p = last bin), so every row maps.
    *
    * Scale shape: the corpus is touched exactly TWICE (plan-digest
    * pinned) — one map-side-combined (group, bin) count aggregate, and
    * one row-level application scan that joins the BROADCAST map; the
    * row stream itself is never shuffled. Group CDF and pooled CDF
    * both ride the SAME model-sized aggregate (pooled cum = a RANGE
    * window over the bin order — every group's count at bins ≤ b —
    * so no second corpus aggregate); the (g, b)→p map is a
    * groups×bins×bins model-sized join.
    *
    * @return (idCol, groupCol, valueCol, qn) — qn = lo + (p + 0.5)·w
    *         in the pooled value space; NULL values are excluded. */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
                        valueCol: String, lo: Double, hi: Double,
                        bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 65536, s"bins must be in [2,65536]")
    require(hi > lo, "hi must be > lo")
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / bins
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol).cast("double") - lit(lo)) / lit(w)).cast("int")))
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(idCol), col(groupCol).cast("string").as("__g"),
        col(valueCol), bin.as("__b"))
    val gb = rows.groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
    // group CDF (per-group window) AND pooled CDF (a RANGE window over
    // the bin order sums every group's count at bins ≤ b — pooled cum
    // without a second aggregate over the corpus) ride the SAME
    // model-sized gb relation: the corpus is aggregated exactly once
    val stats = gb.select(col("__g"), col("__b"), col("__c"),
      sum("__c").over(Window.partitionBy("__g").orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("__cum"),
      sum("__c").over(Window.partitionBy("__g")).as("__n"),
      sum("__c").over(Window.orderBy("__b")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow))
        .as("__pcum"),
      sum("__c").over(Window.partitionBy()).as("__tot"))
    val pooled = stats.select(col("__b").as("__pb"), col("__pcum")
        .as("__ppcum")).distinct()
    val mapping = stats.join(broadcast(pooled),
        d38(col("__ppcum")) * d38(col("__n")) >=
          d38(col("__cum")) * d38(col("__tot")))
      .groupBy("__g", "__b").agg(min("__pb").as("__p"))
    rows.join(broadcast(mapping), Seq("__g", "__b"))
      .select(col(idCol), col("__g").as(groupCol), col(valueCol),
        (lit(lo) + (col("__p") + lit(0.5)) * lit(w)).as("qn"))
  }

  /** [[quantileNormalize]] as DuckDB SQL — identical binning, integer
    * cross-multiplied CDF mapping (HUGEINT), identical midpoint
    * arithmetic (the `$w` literal prints through Scala's
    * shortest-round-trip Double repr, so both engines parse the same
    * double). */
  def quantileNormalizeOracleSql(relation: String, idExpr: String,
                                 groupExpr: String, valueExpr: String,
                                 lo: Double, hi: Double,
                                 bins: Int): String = {
    val w = (hi - lo) / bins
    s"""WITH r AS (SELECT $idExpr AS id, CAST($groupExpr AS VARCHAR) AS g,
       |    $valueExpr AS v,
       |    LEAST(${bins - 1}, GREATEST(0, CAST(floor(
       |      (CAST($valueExpr AS DOUBLE) - ($lo)) / $w) AS INT))) AS b
       |  FROM $relation WHERE ($valueExpr) IS NOT NULL),
       |gb AS (SELECT g, b, CAST(count(*) AS BIGINT) AS c FROM r
       |  GROUP BY g, b),
       |gc AS (SELECT g, b,
       |    CAST(sum(c) OVER (PARTITION BY g ORDER BY b) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n FROM gb),
       |pl AS (SELECT b AS pb,
       |    CAST(sum(c0) OVER (ORDER BY b) AS BIGINT) AS pcum,
       |    CAST(sum(c0) OVER () AS BIGINT) AS nn
       |  FROM (SELECT b, CAST(sum(c) AS BIGINT) AS c0 FROM gb GROUP BY b)),
       |map AS (SELECT g, b, min(pb) AS p FROM gc JOIN pl
       |  ON CAST(pcum AS HUGEINT) * CAST(n AS HUGEINT)
       |    >= CAST(cum AS HUGEINT) * CAST(nn AS HUGEINT)
       |  GROUP BY g, b)
       |SELECT r.id, r.g, r.v,
       |  ($lo) + (CAST(map.p AS DOUBLE) + 0.5) * $w AS qn
       |FROM r JOIN map USING (g, b)""".stripMargin
  }
}
