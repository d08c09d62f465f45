package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model / retrieval / annotation evaluation metrics — the readouts a
  * training-data pipeline runs on its classifier filters, its retrieval
  * index, and its labeling passes before trusting them at corpus scale.
  *
  * Every metric here is formulated so the result is bit-identical across
  * engines and partitionings: integer counts or nano-quantized long
  * terms are the ONLY things aggregated, and doubles appear in a single
  * closed-form expression tree at the very end (both engines evaluate
  * the same IEEE ops in the same order). No metric in this file sums raw
  * doubles.
  *
  * Scale shapes:
  *  - [[aucRoc]] collapses the corpus to the distinct-score relation in
  *    one grouped aggregate; the cumulative walk runs on THAT (one
  *    global-ordered window over |distinct scores| rows — model-sized
  *    for any quantized/logit-bucketed score column; for genuinely
  *    continuous scores at 100 TB, bucket the score first — the
  *    fixed-bin seam documented in SCALE.md).
  *  - [[rankingMetrics]] shuffles ONCE on the query key; both the
  *    scored ranking and the ideal (re-)ranking are Window passes over
  *    the same exchange (two sorts, one shuffle). Output is one row per
  *    query.
  *  - [[cohenKappa]] is one grouped count over the (a, b) label cells,
  *    then marginal products on the model-sized label relation.
  *  - [[rougeN]] shuffles (pair, gram) then pair — n-gram multiplicity
  *    counts never leave their pair, so hub grams are bounded by
  *    per-document length, not corpus frequency.
  */
object Eval {

  /** Exact ROC-AUC via the Mann–Whitney rank-sum with average-rank tie
    * handling: AUC = (wins + ties/2) / (P·N), computed as exact integer
    * pair counts over the distinct-score relation.
    *
    * For each distinct score s (ascending): positives at s beat every
    * negative strictly below and half-win ties at s, so
    * 2·numerator = Σ_s pos_s · (2·negBelow_s + neg_s) — longs
    * throughout, one double division at the end. Rows with a NULL score
    * or label are excluded (no trial). Returns ONE row:
    * (n_pos, n_neg, auc). AUC is NULL when either class is empty.
    *
    * The cumulative window runs on the post-collapse distinct-score
    * relation. That global order is the honest cost of an exact AUC —
    * at 100 TB with a continuous score, quantize the score into fixed
    * bins first (the operator is then exact over the binned scores,
    * which is the standard reported AUC at scale). */
  def aucRoc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val lab = col(labelCol).cast("boolean")
    val byScore = df.where(col(scoreCol).isNotNull && lab.isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(coalesce(sum(when(lab, 1L).otherwise(0L)), lit(0L)).as("__pos"),
        coalesce(sum(when(lab, 0L).otherwise(1L)), lit(0L)).as("__neg"))
    val w = Window.orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = byScore.withColumn("__cumneg", sum("__neg").over(w))
    // The pair-count numerator is Σ pos·(2·cumneg−neg) with magnitude up
    // to 2·P·N — at multi-billion rows per class that exceeds Long range
    // and Spark's non-ANSI long sum would wrap SILENTLY while the DuckDB
    // oracle promotes to HUGEINT. Accumulate in decimal(38,0) (the same
    // trick cohenKappa uses); the decimal→double cast at the end is the
    // identical IEEE value the oracle's HUGEINT→double cast produces.
    val pairTerm = (col("__pos").cast("decimal(38,0)") *
      (lit(2L) * col("__cumneg") - col("__neg")).cast("decimal(38,0)"))
    val agg = walked.agg(
      coalesce(sum("__pos"), lit(0L)).as("n_pos"),
      coalesce(sum("__neg"), lit(0L)).as("n_neg"),
      coalesce(sum(pairTerm), lit(0).cast("decimal(38,0)")).as("__num2"))
    agg.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        col("__num2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** Area under the precision–recall curve (average precision over
    * thresholds) — the readout that matters when positives are rare
    * and ROC-AUC flatters (a 1%-positive quality filter can post
    * AUC 0.95 while drowning every kept doc in false positives).
    *
    * AP = Σ_s (pos_s/P)·precision(s) walking distinct scores
    * DESCENDING, with precision(s) = cumPos_s/cumAll_s at each
    * threshold — the standard step-wise interpolation
    * (scikit-learn's `average_precision_score`). Same collapse shape
    * as [[aucRoc]]: ONE grouped aggregate to the distinct-score
    * relation, a cumulative window over it, a final aggregate.
    * Per-threshold terms quantize to longs via
    * `floor(1e9·pos·cumPos/cumAll)` BEFORE the sum (the identical
    * double expression tree on both engines), one division by 1e9·P at
    * the end. Rows with a NULL score or label are excluded. Returns ONE
    * row: (n_pos, n_neg, pr_auc); NULL when there are no positives. */
  def prAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val lab = col(labelCol).cast("boolean")
    val byScore = df.where(col(scoreCol).isNotNull && lab.isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(coalesce(sum(when(lab, 1L).otherwise(0L)), lit(0L)).as("__pos"),
        count(lit(1)).as("__n"))
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = byScore
      .withColumn("__cumpos", sum("__pos").over(w))
      .withColumn("__cumall", sum("__n").over(w))
      .withColumn("__t", floor(lit(1e9) * col("__pos") * col("__cumpos") /
        col("__cumall")).cast("long"))
    // __t ≤ 1e9·pos_s per score, so Σ__t ≤ 1e9·P — wraps Long past ~9.2
    // billion positives. decimal(38,0) accumulation, double at the end
    // (the oracle's sum(BIGINT) already promotes to HUGEINT and casts to
    // DOUBLE in its output, so the engines stay bit-identical).
    walked.agg(
      coalesce(sum("__pos"), lit(0L)).as("n_pos"),
      (coalesce(sum("__n"), lit(0L)) - coalesce(sum("__pos"), lit(0L)))
        .as("n_neg"),
      coalesce(sum(col("__t").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("__tsum"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0,
          col("__tsum").cast("double") / (lit(1e9) * col("n_pos")))
          .as("pr_auc"))
  }

  /** [[prAuc]] as DuckDB SQL (scoreExpr/labelExpr are SQL
    * expressions over `relation`). */
  def prAucOracleSql(relation: String, scoreExpr: String,
                     labelExpr: String): String =
    s"""WITH g AS (SELECT $scoreExpr AS s,
       |    CAST(COALESCE(sum(CASE WHEN $labelExpr THEN 1 ELSE 0 END), 0) AS BIGINT) AS pos,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM $relation
       |  WHERE ($scoreExpr) IS NOT NULL AND ($labelExpr) IS NOT NULL
       |  GROUP BY 1),
       |wlk AS (SELECT pos, n,
       |    CAST(floor(1e9 * pos * (sum(pos) OVER win) / (sum(n) OVER win))
       |      AS BIGINT) AS t
       |  FROM g
       |  WINDOW win AS (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW))
       |SELECT CAST(COALESCE(sum(pos), 0) AS BIGINT) AS n_pos,
       |  CAST(COALESCE(sum(n), 0) - COALESCE(sum(pos), 0) AS BIGINT) AS n_neg,
       |  CASE WHEN COALESCE(sum(pos), 0) > 0
       |    THEN CAST(COALESCE(sum(t), 0) AS DOUBLE) / (1e9 * sum(pos))
       |    ELSE NULL END AS pr_auc
       |FROM wlk""".stripMargin

  /** [[aucRoc]] as DuckDB SQL over `relation` (scoreExpr/labelExpr are
    * SQL expressions): identical collapse, identical integer pair
    * arithmetic, identical final division. */
  def aucRocOracleSql(relation: String, scoreExpr: String,
                      labelExpr: String): String =
    s"""WITH g AS (SELECT $scoreExpr AS s,
       |    CAST(COALESCE(sum(CASE WHEN $labelExpr THEN 1 ELSE 0 END), 0) AS BIGINT) AS pos,
       |    CAST(COALESCE(sum(CASE WHEN $labelExpr THEN 0 ELSE 1 END), 0) AS BIGINT) AS neg
       |  FROM $relation
       |  WHERE ($scoreExpr) IS NOT NULL AND ($labelExpr) IS NOT NULL
       |  GROUP BY 1),
       |wlk AS (SELECT pos, neg,
       |    sum(neg) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS cumneg
       |  FROM g)
       |SELECT CAST(COALESCE(sum(pos), 0) AS BIGINT) AS n_pos,
       |  CAST(COALESCE(sum(neg), 0) AS BIGINT) AS n_neg,
       |  CASE WHEN COALESCE(sum(pos), 0) > 0 AND COALESCE(sum(neg), 0) > 0
       |    THEN CAST(sum(CAST(pos AS HUGEINT) * (2 * cumneg - neg)) AS DOUBLE)
       |      / (2.0 * sum(pos) * sum(neg))
       |    ELSE NULL END AS auc
       |FROM wlk""".stripMargin

  /** Per-query retrieval metrics over a scored candidate relation
    * (queryCol, docCol, scoreCol, relCol with graded integer relevance,
    * 0 = irrelevant): MRR, precision@k, recall@k, average precision,
    * and NDCG@k (exponential gain 2^rel − 1).
    *
    * Ranks are deterministic: score DESC with docCol ASC tie-break; the
    * ideal ranking for NDCG re-sorts the same partition by rel DESC,
    * doc ASC. Per-term quotients (cumRel/rank for AP, gain/log2(rank+1)
    * for DCG) are nano-quantized to longs BEFORE the per-query sum, so
    * the aggregate is order-exact; NDCG divides the two quantized sums
    * directly (the 1e9 scale cancels). Rows with NULL score or rel are
    * excluded. One row per query. */
  def rankingMetrics(df: DataFrame, queryCol: String, docCol: String,
                     scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val q = col(queryCol)
    val rel = col(relCol).cast("long")
    val base = df.where(col(scoreCol).isNotNull && rel.isNotNull)
    val w = Window.partitionBy(q).orderBy(col(scoreCol).desc, col(docCol).asc)
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wi = Window.partitionBy(q).orderBy(rel.desc, col(docCol).asc)
    val gain = pow(lit(2.0), rel) - lit(1.0)
    val ranked = base
      .withColumn("__r", row_number().over(w))
      .withColumn("__cumrel",
        sum(when(rel > 0, 1L).otherwise(0L)).over(wRows))
      .withColumn("__ir", row_number().over(wi))
      .withColumn("__dcg_t", when(col("__r") <= k,
        floor(lit(1e9) * gain / log2(col("__r") + 1)).cast("long"))
        .otherwise(0L))
      .withColumn("__idcg_t", when(col("__ir") <= k,
        floor(lit(1e9) * gain / log2(col("__ir") + 1)).cast("long"))
        .otherwise(0L))
      .withColumn("__ap_t", when(rel > 0,
        floor(lit(1e9) * col("__cumrel") / col("__r")).cast("long"))
        .otherwise(0L))
    ranked.groupBy(q.as("query"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(rel > 0, 1L).otherwise(0L)), lit(0L)).as("n_rel"),
        coalesce(sum(when(rel > 0 && col("__r") <= k, 1L).otherwise(0L)),
          lit(0L)).as("__hits_k"),
        min(when(rel > 0, col("__r"))).as("__first_rel"),
        coalesce(sum(col("__dcg_t")), lit(0L)).as("__dcg"),
        coalesce(sum(col("__idcg_t")), lit(0L)).as("__idcg"),
        coalesce(sum(col("__ap_t")), lit(0L)).as("__ap"))
      .select(col("query"), col("n_docs"), col("n_rel"),
        when(col("__first_rel").isNotNull,
          lit(1.0) / col("__first_rel")).otherwise(0.0).as("mrr"),
        (col("__hits_k").cast("double") / lit(k.toDouble))
          .as("precision_at_k"),
        when(col("n_rel") > 0,
          col("__hits_k").cast("double") / col("n_rel"))
          .otherwise(0.0).as("recall_at_k"),
        when(col("n_rel") > 0,
          col("__ap").cast("double") / (lit(1e9) * col("n_rel")))
          .otherwise(0.0).as("avg_precision"),
        when(col("__idcg") > 0,
          col("__dcg").cast("double") / col("__idcg"))
          .otherwise(0.0).as("ndcg_at_k"))
  }

  /** [[rankingMetrics]] as DuckDB SQL. `relation` must expose columns
    * (query, doc, score, rel); identical rank tie-breaks, identical
    * nano-quantized terms, identical final expressions. */
  def rankingMetricsOracleSql(relation: String, k: Int): String =
    s"""WITH ranked AS (SELECT query, rel,
       |    row_number() OVER (PARTITION BY query ORDER BY score DESC, doc ASC) AS r,
       |    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY query ORDER BY score DESC, doc ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumrel,
       |    row_number() OVER (PARTITION BY query ORDER BY rel DESC, doc ASC) AS ir
       |  FROM $relation
       |  WHERE score IS NOT NULL AND rel IS NOT NULL),
       |terms AS (SELECT query, rel, r,
       |    CASE WHEN r <= $k THEN CAST(floor(1e9 * (power(2.0, rel) - 1.0)
       |      / log2(r + 1)) AS BIGINT) ELSE 0 END AS dcg_t,
       |    CASE WHEN ir <= $k THEN CAST(floor(1e9 * (power(2.0, rel) - 1.0)
       |      / log2(ir + 1)) AS BIGINT) ELSE 0 END AS idcg_t,
       |    CASE WHEN rel > 0 THEN CAST(floor(1e9 * cumrel / r) AS BIGINT)
       |      ELSE 0 END AS ap_t
       |  FROM ranked),
       |agg AS (SELECT query, count(*) AS n_docs,
       |    CAST(COALESCE(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_rel,
       |    CAST(COALESCE(sum(CASE WHEN rel > 0 AND r <= $k THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits_k,
       |    min(CASE WHEN rel > 0 THEN r END) AS first_rel,
       |    COALESCE(sum(dcg_t), 0) AS dcg, COALESCE(sum(idcg_t), 0) AS idcg,
       |    COALESCE(sum(ap_t), 0) AS ap
       |  FROM terms GROUP BY query)
       |SELECT query, n_docs, n_rel,
       |  CASE WHEN first_rel IS NOT NULL THEN 1.0 / first_rel ELSE 0.0 END AS mrr,
       |  CAST(hits_k AS DOUBLE) / ${k.toDouble} AS precision_at_k,
       |  CASE WHEN n_rel > 0 THEN CAST(hits_k AS DOUBLE) / n_rel
       |    ELSE 0.0 END AS recall_at_k,
       |  CASE WHEN n_rel > 0 THEN CAST(ap AS DOUBLE) / (1e9 * n_rel)
       |    ELSE 0.0 END AS avg_precision,
       |  CASE WHEN idcg > 0 THEN CAST(dcg AS DOUBLE) / idcg
       |    ELSE 0.0 END AS ndcg_at_k
       |FROM agg""".stripMargin

  /** Cohen's kappa inter-rater agreement over two label columns:
    * κ = (p_o − p_e) / (1 − p_e), computed entirely in integers —
    * κ = (agree·T − S) / (T² − S) with S = Σ_label nA·nB over the
    * shared label space (marginal-product expected agreement). Rows
    * where either rater is NULL are excluded (not rated twice). Returns
    * ONE row: (n, observed_agreement, expected_agreement, kappa); kappa
    * is NULL when T² = S (no variation to agree beyond chance on).
    *
    * ONE grouped count over the (a, b) cells; marginals and their
    * product-join run on the model-sized label relation. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val totals = cells.agg(
      coalesce(sum("__c"), lit(0L)).as("__t"),
      coalesce(sum(when(col("__a") === col("__b"), col("__c"))
        .otherwise(0L)), lit(0L)).as("__agree"))
    val ma = cells.groupBy(col("__a").as("__l"))
      .agg(sum("__c").as("__na"))
    val mb = cells.groupBy(col("__b").as("__l"))
      .agg(sum("__c").as("__nb"))
    // marginal products n_a·n_b wrap int64 past ~3e9 rated rows per
    // label — accumulate in decimal(38,0) like every other pair-count
    // sum in this file (the oracle mirrors via HUGEINT)
    val s = ma.join(mb, "__l")
      .agg(coalesce(sum(col("__na").cast("decimal(38,0)") *
        col("__nb").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("__s"))
    // products in DECIMAL(38,0): agree·T, T², S all stay exact past the
    // long overflow line (T > ~3·10⁹ rated rows at corpus scale); both
    // engines then round the SAME exact integers to double once, and
    // the final division is a single IEEE op
    val tD = col("__t").cast("decimal(38,0)")
    val sD = col("__s").cast("decimal(38,0)")
    val aD = col("__agree").cast("decimal(38,0)")
    totals.crossJoin(broadcast(s))
      .select(col("__t").as("n"),
        when(col("__t") > 0,
          col("__agree").cast("double") / col("__t"))
          .as("observed_agreement"),
        when(col("__t") > 0,
          sD.cast("double") / (tD * tD).cast("double"))
          .as("expected_agreement"),
        when((tD * tD - sD).cast("double") =!= 0.0,
          (aD * tD - sD).cast("double") / (tD * tD - sD).cast("double"))
          .as("kappa"))
  }

  /** [[cohenKappa]] as DuckDB SQL (aExpr/bExpr are SQL label
    * expressions over `relation`). */
  def cohenKappaOracleSql(relation: String, aExpr: String,
                          bExpr: String): String =
    s"""WITH cells AS (SELECT $aExpr AS a, $bExpr AS b,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM $relation
       |  WHERE ($aExpr) IS NOT NULL AND ($bExpr) IS NOT NULL
       |  GROUP BY 1, 2),
       |tot AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS t,
       |    CAST(COALESCE(sum(CASE WHEN a = b THEN c ELSE 0 END), 0) AS BIGINT) AS agree
       |  FROM cells),
       |ma AS (SELECT a AS l, CAST(sum(c) AS BIGINT) AS na FROM cells GROUP BY a),
       |mb AS (SELECT b AS l, CAST(sum(c) AS BIGINT) AS nb FROM cells GROUP BY b),
       |se AS (SELECT COALESCE(sum(CAST(na AS HUGEINT)
       |    * CAST(nb AS HUGEINT)), 0) AS s
       |  FROM ma JOIN mb USING (l))
       |SELECT t AS n,
       |  CASE WHEN t > 0 THEN CAST(agree AS DOUBLE) / t END AS observed_agreement,
       |  CASE WHEN t > 0 THEN CAST(s AS DOUBLE)
       |    / CAST(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) AS DOUBLE)
       |  END AS expected_agreement,
       |  CASE WHEN CAST(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
       |      - CAST(s AS HUGEINT) AS DOUBLE) <> 0.0
       |    THEN CAST(CAST(agree AS HUGEINT) * CAST(t AS HUGEINT)
       |        - CAST(s AS HUGEINT) AS DOUBLE)
       |      / CAST(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
       |        - CAST(s AS HUGEINT) AS DOUBLE)
       |  END AS kappa
       |FROM tot, se""".stripMargin

  /** Per-slice binary classification report — the "how does the filter
    * behave on EACH source/language" readout that decides whether a
    * quality classifier is safe to apply corpus-wide (aggregate
    * accuracy hides a slice it guts). One ROLLUP aggregate produces
    * every slice AND the overall row (`slice = '__all__'`) in a single
    * Expand pass — never one scan per slice.
    *
    * Counts (tp/fp/fn/tn) are exact longs; precision, recall, F1
    * (= 2tp/(2tp+fp+fn), the single-division form), accuracy and MCC
    * are mirrored one-shot double expressions over them. Degenerate
    * margins (a metric's denominator 0) yield NULL, never NaN/Inf (the
    * bleuCorpus rule). MCC's four marginal factors multiply as doubles
    * in a pinned order — exact products would need int256 at corpus
    * scale, and both engines evaluate the identical IEEE tree. NULL
    * labels/predictions are excluded; NULL slice values report as
    * '__null__' (kept distinct from the rollup total row). '__all__'
    * and '__null__' are RESERVED sentinels — a genuine slice value
    * equal to either collides with them (rename upstream). On an
    * empty/fully-excluded input both engines return ZERO rows (the
    * oracle filters DuckDB's empty-input grand-total row to match
    * Spark's Expand-based rollup, which emits none).
    *
    * @return (slice, n, tp, fp, fn, tn, prec, rec, f1, acc, mcc). */
  /** The shared confusion→metric algebra (prec, rec, F1 as
    * 2tp/(2tp+fp+fn), acc) with NULL on degenerate margins — ONE
    * definition used by both [[classificationReport]] and
    * [[graft.streaming.GraftStreaming.confusionStream]], so the
    * stream ≡ batch metric identity holds BY CONSTRUCTION, not by
    * keeping two copies in sync. */
  private[graft] def confusionMetricCols(tp: Column, fp: Column,
                                         fn: Column, tn: Column,
                                         n: Column): Seq[Column] = Seq(
    when(tp + fp > 0, tp.cast("double") / (tp + fp)).as("prec"),
    when(tp + fn > 0, tp.cast("double") / (tp + fn)).as("rec"),
    when(lit(2L) * tp + fp + fn > 0,
      (lit(2L) * tp).cast("double") / (lit(2L) * tp + fp + fn)).as("f1"),
    when(n > 0, (tp + tn).cast("double") / n).as("acc"))

  /** [[confusionMetricCols]] as DuckDB SQL select-items over columns
    * named tp/fp/fn/tn/n — the single SQL copy both oracles embed. */
  private[graft] def confusionMetricsSqlItems: String =
    """CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS prec,
      |    CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS rec,
      |    CASE WHEN 2 * tp + fp + fn > 0
      |      THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END AS f1,
      |    CASE WHEN n > 0 THEN CAST(tp + tn AS DOUBLE) / n END AS acc"""
      .stripMargin

  def classificationReport(df: DataFrame, labelCol: String,
                           predCol: String, sliceCol: String): DataFrame = {
    val lab = col(labelCol).cast("boolean")
    val prd = col(predCol).cast("boolean")
    val base = df.where(lab.isNotNull && prd.isNotNull)
      .select(coalesce(col(sliceCol).cast("string"), lit("__null__"))
          .as("__s"),
        lab.as("__y"), prd.as("__p"))
    def cnt(c: Column) =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val agg = base.rollup("__s").agg(
      count(lit(1)).as("n"),
      cnt(col("__y") && col("__p")).as("tp"),
      cnt(!col("__y") && col("__p")).as("fp"),
      cnt(col("__y") && !col("__p")).as("fn"),
      cnt(!col("__y") && !col("__p")).as("tn"))
    val (tp, fp, fn_, tn) = (col("tp"), col("fp"), col("fn"), col("tn"))
    val d1 = (tp + fp).cast("double")
    val d2 = (tp + fn_).cast("double")
    val d3 = (tn + fp).cast("double")
    val d4 = (tn + fn_).cast("double")
    agg.select(Seq(coalesce(col("__s"), lit("__all__")).as("slice"),
      col("n"), tp, fp, fn_, tn) ++
      confusionMetricCols(tp, fp, fn_, tn, col("n")) :+
      when(d1 > 0 && d2 > 0 && d3 > 0 && d4 > 0,
        (tp.cast("double") * tn.cast("double") -
          fp.cast("double") * fn_.cast("double")) /
          sqrt((d1 * d2) * (d3 * d4))).as("mcc"): _*)
  }

  /** [[classificationReport]] as DuckDB SQL (labelExpr/predExpr are
    * boolean SQL expressions, sliceExpr a SQL expression over
    * `relation`) — identical ROLLUP, counts and IEEE order. */
  def classificationReportOracleSql(relation: String, labelExpr: String,
                                    predExpr: String,
                                    sliceExpr: String): String =
    s"""WITH b AS (SELECT
       |    COALESCE(CAST($sliceExpr AS VARCHAR), '__null__') AS s,
       |    CASE WHEN $labelExpr THEN 1 ELSE 0 END AS y,
       |    CASE WHEN $predExpr THEN 1 ELSE 0 END AS p
       |  FROM $relation
       |  WHERE ($labelExpr) IS NOT NULL AND ($predExpr) IS NOT NULL),
       |g AS (SELECT COALESCE(s, '__all__') AS slice,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(COALESCE(sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
       |    CAST(COALESCE(sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
       |    CAST(COALESCE(sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn,
       |    CAST(COALESCE(sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS tn
       |  FROM b GROUP BY ROLLUP(s))
       |SELECT slice, n, tp, fp, fn, tn,
       |  $confusionMetricsSqlItems,
       |  CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
       |      AND tn + fn > 0
       |    THEN (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
       |        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
       |      / sqrt((CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE))
       |        * (CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)))
       |  END AS mcc
       |FROM g
       |WHERE n > 0""".stripMargin

  /** Krippendorff's alpha (nominal data) — the agreement coefficient
    * that handles what [[cohenKappa]] (exactly 2 raters) and
    * [[fleissKappa]] (fixed rater count per item) cannot: ANY number
    * of raters per item with MISSING ratings, the normal shape of a
    * real annotation drop. Units with fewer than two ratings are
    * excluded (standard; they carry no agreement evidence).
    *
    * alpha = 1 − Do/De over nominal distance:
    * {{{
    *   Do = (1/N) Σ_i [m_i² − Σ_c r_ic²] / (m_i − 1)
    *   De = (1/(N(N−1))) Σ_c n_c (N − n_c)
    * }}}
    * with r_ic = ratings of category c on item i, m_i = Σ_c r_ic,
    * N = Σ m_i, n_c the category margins over the kept items.
    *
    * Exactness: the per-item division quantizes as the integer
    * `(1e9·(m²−Σr²)) DIV (m−1)` (exact, order-invariant; needs
    * m_i < ~95 000 ratings per item to stay in int64 — far past any
    * human annotation layout), per-item terms and margins sum in
    * decimal(38,0), and alpha is ONE mirrored double expression at the
    * end. De = 0 (all kept ratings in one category) or N < 2 → NULL.
    *
    * Scale shape: one (item, cat) count aggregate over the corpus,
    * one item-sized and one category-sized aggregate, scalar
    * broadcasts — no join ever touches the raw ratings twice.
    *
    * @return ONE row: (n, n_items, n_cats, alpha). */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        catCol: String): DataFrame = {
    val ic = df.where(col(itemCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(catCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__r"))
    val items = ic.groupBy("__i")
      .agg(sum("__r").as("__m"),
        sum(col("__r") * col("__r")).as("__rr"))
      .where(col("__m") >= 2)
    val obs = items.agg(
      coalesce(sum(col("__m")), lit(0L)).as("__N"),
      count(lit(1)).as("n_items"),
      coalesce(sum(expr(
        "(1000000000L * (__m * __m - __rr)) DIV (__m - 1)")
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("__Q"))
    val margins = ic.join(items.select("__i"), Seq("__i"), "left_semi")
      .groupBy("__c").agg(sum("__r").as("__nc"))
    margins.crossJoin(broadcast(obs))
      .agg(first(col("__N")).as("n"), first(col("n_items")).as("n_items"),
        count(lit(1)).as("n_cats"),
        first(col("__Q")).as("__Q"),
        coalesce(sum(col("__nc").cast("decimal(38,0)") *
          (col("__N") - col("__nc")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("__D"))
      .select(col("n"), col("n_items"), col("n_cats"),
        when(col("__D") > 0 && col("n") >= 2,
          lit(1.0) -
            (col("__Q") * (col("n") - 1).cast("decimal(38,0)"))
              .cast("double") /
              (lit(1e9) * col("__D").cast("double"))).as("alpha"))
  }

  /** [[krippendorffAlpha]] as DuckDB SQL (itemExpr/catExpr over
    * `relation`) — identical quantized per-item division (`//` floor ≡
    * Spark DIV on these non-negative terms), HUGEINT-exact sums,
    * identical final IEEE expression. */
  def krippendorffAlphaOracleSql(relation: String, itemExpr: String,
                                 catExpr: String): String =
    s"""WITH ic AS (SELECT $itemExpr AS i, CAST($catExpr AS VARCHAR) AS c,
       |    CAST(count(*) AS BIGINT) AS r
       |  FROM $relation
       |  WHERE ($itemExpr) IS NOT NULL AND ($catExpr) IS NOT NULL
       |  GROUP BY 1, 2),
       |it AS (SELECT i, CAST(sum(r) AS BIGINT) AS m,
       |    CAST(sum(r * r) AS BIGINT) AS rr
       |  FROM ic GROUP BY i HAVING sum(r) >= 2),
       |obs AS (SELECT CAST(COALESCE(sum(m), 0) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS n_items,
       |    COALESCE(sum((1000000000 * (m * m - rr)) // (m - 1)), 0) AS q
       |  FROM it),
       |mg AS (SELECT c, CAST(sum(r) AS BIGINT) AS nc
       |  FROM ic JOIN it USING (i) GROUP BY c),
       |de AS (SELECT any_value(n) AS n, any_value(n_items) AS n_items,
       |    CAST(count(*) AS BIGINT) AS n_cats, any_value(q) AS q,
       |    COALESCE(sum(CAST(nc AS HUGEINT) * (n - nc)), 0) AS d
       |  FROM mg, obs)
       |SELECT n, n_items, n_cats,
       |  CASE WHEN d > 0 AND n >= 2
       |    THEN 1.0 - CAST(q * (n - 1) AS DOUBLE)
       |      / (1e9 * CAST(d AS DOUBLE)) END AS alpha
       |FROM de""".stripMargin

  /** Corpus-level BLEU (Papineni 2002, uniform weights, no smoothing)
    * of (candidate, reference) text pairs: modified n-gram precision
    * p_n for n = 1..maxN with per-pair clipping, geometric mean, and
    * the brevity penalty on total token lengths.
    *
    * Same tokenization/n-gram grammar as [[rougeN]] (the dedup shingle
    * machinery, short-text fallback included). All matches/totals are
    * integer sums; p_n are single divisions; BP and the geometric mean
    * are one closed-form double expression (exp/ln — both engines
    * evaluate the same tree; callers round the output like every other
    * closed-form metric in the repo). BLEU is 0 when any p_n is 0
    * (standard unsmoothed convention), NULL only on an empty pair set.
    *
    * Shapes: 2·maxN tagged gram streams explode map-side → ONE
    * (n, pair, gram) exchange → n-sized aggregate; lengths are one
    * tiny parallel aggregate crossJoined back (broadcast). Returns ONE
    * row: (n_pairs, cand_tokens, ref_tokens, p1..p{maxN}, bp, bleu). */
  def bleuCorpus(pairs: DataFrame, idCol: String, candCol: String,
                 refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    def side(c: String, tag: String, n: Int) = pairs.select(
      lit(n).as("__n"), col(idCol).as("__id"),
      explode(Dedup.shinglesAll(coalesce(col(c), lit("")), n)).as("__g"),
      lit(tag).as("__side"))
    val streams = (1 to maxN).flatMap(n =>
      Seq(side(candCol, "c", n), side(refCol, "r", n)))
    val clipped = streams.reduce(_ unionAll _)
      .groupBy("__n", "__id", "__g")
      .agg(coalesce(sum(when(col("__side") === "c", 1L).otherwise(0L)),
        lit(0L)).as("__cc"),
        coalesce(sum(when(col("__side") === "r", 1L).otherwise(0L)),
          lit(0L)).as("__rc"))
    val perN = clipped.groupBy("__n")
      .agg(sum(least(col("__cc"), col("__rc"))).as("__m"),
        sum("__cc").as("__t"))
    val statCols = (1 to maxN).flatMap(n => Seq(
      coalesce(sum(when(col("__n") === n, col("__m"))), lit(0L))
        .as(s"__m$n"),
      coalesce(sum(when(col("__n") === n, col("__t"))), lit(0L))
        .as(s"__t$n")))
    val stats = perN.agg(statCols.head, statCols.tail: _*)
    val lens = pairs.agg(count(lit(1)).as("n_pairs"),
      coalesce(sum(TextAnalysis.tokenCount(coalesce(col(candCol), lit("")))
        .cast("long")), lit(0L)).as("cand_tokens"),
      coalesce(sum(TextAnalysis.tokenCount(coalesce(col(refCol), lit("")))
        .cast("long")), lit(0L)).as("ref_tokens"))
    // div-by-zero seams guarded EXPLICITLY: Spark doubles give IEEE
    // NaN/Inf where DuckDB gives NULL, so neither engine's default may
    // reach the output
    def p(n: Int): Column = when(col(s"__t$n") > 0,
      col(s"__m$n").cast("double") / col(s"__t$n"))
    val allMatched = (1 to maxN).map(n => col(s"__m$n") > 0)
      .reduce(_ && _)
    val bp = when(col("cand_tokens") >= col("ref_tokens"), lit(1.0))
      .when(col("cand_tokens") > 0,
        exp(lit(1.0) - col("ref_tokens").cast("double") /
          col("cand_tokens")))
      .otherwise(0.0)
    val geo = exp((1 to maxN).map(n => log(p(n))).reduce(_ + _) /
      lit(maxN.toDouble))
    lens.crossJoin(broadcast(stats))
      .select(Seq(col("n_pairs"), col("cand_tokens"), col("ref_tokens")) ++
        (1 to maxN).map(n => p(n).as(s"p$n")) ++ Seq(
          bp.as("bp"),
          when(col("n_pairs") === 0, lit(null).cast("double"))
            .when(allMatched, bp * geo).otherwise(0.0).as("bleu")): _*)
  }

  /** [[bleuCorpus]] as DuckDB SQL. `relation` must expose
    * (id, cand, ref) text columns; identical grammar, counts, and
    * closed-form expression tree. */
  def bleuCorpusOracleSql(relation: String, maxN: Int = 4): String = {
    val grams = (1 to maxN).flatMap { n =>
      val candG = Dedup.shinglesAllOracleSqlExpr("COALESCE(cand, '')", n)
      val refG = Dedup.shinglesAllOracleSqlExpr("COALESCE(ref, '')", n)
      Seq(s"SELECT $n AS n, id, unnest($candG) AS g, 'c' AS side FROM $relation",
        s"SELECT $n AS n, id, unnest($refG) AS g, 'r' AS side FROM $relation")
    }.mkString("\n  UNION ALL ")
    val ms = (1 to maxN).flatMap(n => Seq(
      s"CAST(COALESCE(sum(CASE WHEN n = $n THEN m ELSE 0 END), 0) AS BIGINT) AS m$n",
      s"CAST(COALESCE(sum(CASE WHEN n = $n THEN t ELSE 0 END), 0) AS BIGINT) AS t$n"))
      .mkString(",\n    ")
    val toks =
      "len(list_filter(string_split_regex(trim(%s), '\\s+'), w -> len(w) > 0))"
    val ps = (1 to maxN).map(n =>
      s"CASE WHEN t$n > 0 THEN CAST(m$n AS DOUBLE) / t$n END AS p$n")
      .mkString(",\n  ")
    val allM = (1 to maxN).map(n => s"m$n > 0").mkString(" AND ")
    val geo = (1 to maxN).map(n => s"ln(CAST(m$n AS DOUBLE) / t$n)")
      .mkString(" + ")
    s"""WITH g AS (
       |  $grams),
       |cnt AS (SELECT n, id, g,
       |    CAST(COALESCE(sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END), 0) AS BIGINT) AS cc,
       |    CAST(COALESCE(sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END), 0) AS BIGINT) AS rc
       |  FROM g GROUP BY n, id, g),
       |pern AS (SELECT n, CAST(sum(least(cc, rc)) AS BIGINT) AS m,
       |    CAST(sum(cc) AS BIGINT) AS t
       |  FROM cnt GROUP BY n),
       |stats AS (SELECT
       |    $ms
       |  FROM pern),
       |lens AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(COALESCE(sum(${toks.format("COALESCE(cand, '')")}), 0) AS BIGINT) AS cand_tokens,
       |    CAST(COALESCE(sum(${toks.format("COALESCE(ref, '')")}), 0) AS BIGINT) AS ref_tokens
       |  FROM $relation)
       |SELECT n_pairs, cand_tokens, ref_tokens,
       |  $ps,
       |  CASE WHEN cand_tokens >= ref_tokens THEN 1.0
       |    WHEN cand_tokens > 0
       |      THEN exp(1.0 - CAST(ref_tokens AS DOUBLE) / cand_tokens)
       |    ELSE 0.0
       |  END AS bp,
       |  CASE WHEN n_pairs = 0 THEN NULL
       |    WHEN $allM THEN
       |      (CASE WHEN cand_tokens >= ref_tokens THEN 1.0
       |        WHEN cand_tokens > 0
       |          THEN exp(1.0 - CAST(ref_tokens AS DOUBLE) / cand_tokens)
       |        ELSE 0.0 END)
       |      * exp(($geo) / ${maxN.toDouble})
       |    ELSE 0.0 END AS bleu
       |FROM lens CROSS JOIN stats""".stripMargin
  }

  /** ROUGE-N overlap scoring of (candidate, reference) text pairs:
    * multiset n-gram precision / recall / F1 per pair. Uses the same
    * tokenization and n-gram grammar as the dedup shingle machinery
    * ([[Dedup.shinglesAll]] — whitespace tokens, short-text fallback to
    * the whole text), so the DuckDB mirror is shared. Overlap is the
    * clipped count Σ_g min(count_cand(g), count_ref(g)) — the standard
    * ROUGE/BLEU clipping. All three scores are single divisions of
    * integer counts (F1 = 2·overlap / (candTotal + refTotal) —
    * algebraically identical to the harmonic mean, no intermediate
    * rounding). NULL texts score as empty (one empty-string gram from
    * the fallback, overlapping only another empty side).
    *
    * Shapes: grams explode map-side; counts shuffle on (pair, gram),
    * the report on pair. Gram multiplicity never crosses pairs, so a
    * corpus-frequent gram costs each pair only its own occurrences. */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    def side(c: String, tag: String) = pairs.select(col(idCol).as("__id"),
      explode(Dedup.shinglesAll(coalesce(col(c), lit("")), n)).as("__g"),
      lit(tag).as("__side"))
    val counts = side(candCol, "c").unionAll(side(refCol, "r"))
      .groupBy("__id", "__g")
      .agg(coalesce(sum(when(col("__side") === "c", 1L).otherwise(0L)),
        lit(0L)).as("__cc"),
        coalesce(sum(when(col("__side") === "r", 1L).otherwise(0L)),
          lit(0L)).as("__rc"))
    counts.groupBy(col("__id").as(idCol))
      .agg(sum(least(col("__cc"), col("__rc"))).as("__o"),
        sum("__cc").as("__ct"), sum("__rc").as("__rt"))
      .select(col(idCol),
        col("__o").as("overlap"), col("__ct").as("cand_ngrams"),
        col("__rt").as("ref_ngrams"),
        (col("__o").cast("double") / col("__ct")).as("rouge_precision"),
        (col("__o").cast("double") / col("__rt")).as("rouge_recall"),
        (lit(2.0) * col("__o") / (col("__ct") + col("__rt")))
          .as("rouge_f1"))
  }

  /** [[rougeN]] as DuckDB SQL. `relation` must expose (id, cand, ref)
    * text columns; identical grammar via the shared shingle mirror. */
  def rougeNOracleSql(relation: String, n: Int): String = {
    val candG = Dedup.shinglesAllOracleSqlExpr("COALESCE(cand, '')", n)
    val refG = Dedup.shinglesAllOracleSqlExpr("COALESCE(ref, '')", n)
    s"""WITH g AS (
       |  SELECT id, unnest($candG) AS g, 'c' AS side FROM $relation
       |  UNION ALL
       |  SELECT id, unnest($refG) AS g, 'r' AS side FROM $relation),
       |cnt AS (SELECT id, g,
       |    CAST(COALESCE(sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END), 0) AS BIGINT) AS cc,
       |    CAST(COALESCE(sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END), 0) AS BIGINT) AS rc
       |  FROM g GROUP BY id, g)
       |SELECT id, CAST(sum(least(cc, rc)) AS BIGINT) AS overlap,
       |  CAST(sum(cc) AS BIGINT) AS cand_ngrams,
       |  CAST(sum(rc) AS BIGINT) AS ref_ngrams,
       |  CAST(sum(least(cc, rc)) AS DOUBLE) / sum(cc) AS rouge_precision,
       |  CAST(sum(least(cc, rc)) AS DOUBLE) / sum(rc) AS rouge_recall,
       |  2.0 * sum(least(cc, rc)) / (sum(cc) + sum(rc)) AS rouge_f1
       |FROM cnt GROUP BY id""".stripMargin
  }

  // --------------------------------------------------------------------
  // Fleiss' kappa — chance-corrected agreement among n raters per item
  // (Fleiss 1971), the multi-annotator generalization of [[cohenKappa]]
  // a labeling pass with a rater POOL needs (Cohen assumes the same two
  // raters everywhere). Everything through the agreement and marginal
  // sums is exact integer arithmetic; doubles appear only in the final
  // closed-form readout.
  // --------------------------------------------------------------------

  /** Fleiss' kappa over rating rows `(itemCol, catCol)`. The statistic
    * requires a FIXED number of ratings per item, so the operator
    * self-balances: items with fewer than `n` ratings drop; items with
    * more keep the first `n` in deterministic `(orderCol, catCol)`
    * order (ties inside an item broken by category — replayable on any
    * engine).
    *
    * P̄'s numerator `Σ_i (Σ_j n_ij² − n)` and P̄e's `Σ_j c_j²` are exact
    * integer sums (c_j² in decimal(38,0) — c_j is corpus-sized);
    * P̄ = num/(N·n·(n−1)), P̄e = Σc_j²/(Nn)² and
    * κ = (P̄−P̄e)/(1−P̄e) are single IEEE expression trees over those
    * integers, bit-identical across engines and partitionings.
    *
    * Scale: ONE shuffle on the item key (the balancing window + the
    * (item, cat) count ride the same exchange), then a category-sized
    * aggregate; the readout cross-joins three one-row relations.
    * Output: one row (n_items, n_raters, p_bar, p_e, kappa). */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String,
                  orderCol: String, n: Int): DataFrame = {
    require(n >= 2, s"fleissKappa needs n >= 2 ratings per item, got $n")
    val w = Window.partitionBy(col("__i"))
      .orderBy(col("__o").asc, col("__j").asc)
    val balanced = df
      .where(col(itemCol).isNotNull && col(catCol).isNotNull)
      .select(col(itemCol).as("__i"), col(catCol).as("__j"),
        col(orderCol).as("__o"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__have", count(lit(1)).over(
        Window.partitionBy(col("__i"))))
      .where(col("__have") >= n && col("__rn") <= n)
    val cells = balanced.groupBy("__i", "__j")
      .agg(count(lit(1)).as("__nij"))
    // per-item Σ_j n_ij², then the item-count and observed-agreement
    // numerator in ONE aggregate
    val perItem = cells.groupBy("__i")
      .agg(sum(col("__nij") * col("__nij")).as("__sq"))
    val obs = perItem.agg(count(lit(1)).as("__N"),
      coalesce(sum(col("__sq") - n), lit(0L)).as("__numo"))
    val marg = cells.groupBy("__j").agg(sum("__nij").as("__cj"))
    val margSq = marg.agg(coalesce(
      sum(col("__cj").cast("decimal(38,0)") *
        col("__cj").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
      .as("__csq"))
    val nD = col("__N").cast("decimal(38,0)")
    val nn = lit(n).cast("decimal(38,0)")
    obs.crossJoin(broadcast(margSq))
      .select(col("__N").as("n_items"), lit(n).as("n_raters"),
        when(col("__N") > 0,
          col("__numo").cast("double") /
            (nD * nn * lit(n - 1).cast("decimal(38,0)")).cast("double"))
          .as("p_bar"),
        when(col("__N") > 0,
          col("__csq").cast("double") /
            (nD * nn * nD * nn).cast("double")).as("p_e"))
      .select(col("n_items"), col("n_raters"), col("p_bar"), col("p_e"),
        when(lit(1.0) - col("p_e") =!= 0.0,
          (col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")))
          .as("kappa"))
  }

  /** [[fleissKappa]] as DuckDB SQL: `itemExpr`/`catExpr`/`orderExpr`
    * are SQL expressions over `relation`; same balancing rule, same
    * integer sums, same final expression tree. */
  def fleissKappaOracleSql(relation: String, itemExpr: String,
                           catExpr: String, orderExpr: String,
                           n: Int): String =
    s"""WITH r AS (SELECT $itemExpr AS i, $catExpr AS j, $orderExpr AS o
       |  FROM $relation
       |  WHERE ($itemExpr) IS NOT NULL AND ($catExpr) IS NOT NULL),
       |bal AS (SELECT i, j FROM (
       |    SELECT i, j,
       |      row_number() OVER (PARTITION BY i ORDER BY o ASC, j ASC) AS rn,
       |      count(*) OVER (PARTITION BY i) AS have
       |    FROM r)
       |  WHERE have >= $n AND rn <= $n),
       |cells AS (SELECT i, j, CAST(count(*) AS BIGINT) AS nij
       |  FROM bal GROUP BY i, j),
       |item AS (SELECT i, CAST(sum(nij * nij) AS BIGINT) AS sq
       |  FROM cells GROUP BY i),
       |obs AS (SELECT CAST(count(*) AS BIGINT) AS nitems,
       |    CAST(COALESCE(sum(sq - $n), 0) AS BIGINT) AS numo
       |  FROM item),
       |marg AS (SELECT j, CAST(sum(nij) AS BIGINT) AS cj
       |  FROM cells GROUP BY j),
       |msq AS (SELECT COALESCE(sum(CAST(cj AS HUGEINT) * CAST(cj AS HUGEINT)),
       |    CAST(0 AS HUGEINT)) AS csq FROM marg),
       |pre AS (SELECT nitems, $n AS n_raters,
       |    CASE WHEN nitems > 0 THEN CAST(numo AS DOUBLE)
       |      / CAST(CAST(nitems AS HUGEINT) * $n * ${n - 1} AS DOUBLE)
       |    END AS p_bar,
       |    CASE WHEN nitems > 0 THEN CAST(csq AS DOUBLE)
       |      / CAST(CAST(nitems AS HUGEINT) * $n
       |          * CAST(nitems AS HUGEINT) * $n AS DOUBLE)
       |    END AS p_e
       |  FROM obs, msq)
       |SELECT nitems AS n_items, n_raters, p_bar, p_e,
       |  CASE WHEN 1.0 - p_e <> 0.0
       |    THEN (p_bar - p_e) / (1.0 - p_e) END AS kappa
       |FROM pre""".stripMargin

  // --------------------------------------------------------------------
  // Split-conformal calibration (Vovk et al.; the Angelopoulos–Bates
  // recipe) — turn any binary scorer into prediction SETS with a
  // finite-sample coverage guarantee: the deployment gate for an
  // in-engine filter ([[graft.operators.LinearModel]], q_nb) that must
  // promise "≥ 90% of kept documents really are class 1". Everything
  // reduces to rank statistics on the nonconformity relation —
  // integer-count arithmetic after a distinct-score collapse.
  // --------------------------------------------------------------------

  /** Split-conformal readout for a binary scorer: `cal` calibrates,
    * `ev` evaluates; `scoreCol` = P(class 1), `labelCol` ∈ {0,1}/bool.
    * True-class nonconformity a = 1−s for positives, s for negatives;
    * q̂ = the k-th smallest calibration a with
    * k = ⌈(1−α)(n_cal+1)⌉ (both engines ceil the same double); a row's
    * prediction set contains class 1 iff 1−s ≤ q̂ and class 0 iff
    * s ≤ q̂.
    *
    * Scale: ONE grouped count collapses calibration to the distinct-
    * nonconformity relation (model-sized for any quantized/bucketed
    * score — the [[aucRoc]] contract), a cumulative walk on THAT picks
    * q̂, and the eval side is one broadcast-q̂ aggregate. Output: one
    * row (n_cal, k, qhat, n_eval, coverage, avg_set_size). */
  def splitConformal(cal: DataFrame, ev: DataFrame, scoreCol: String,
                     labelCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    def nonconf(df: DataFrame) = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(when(col(labelCol).cast("boolean"),
        lit(1.0) - col(scoreCol).cast("double"))
        .otherwise(col(scoreCol).cast("double")).as("__a"),
        col(scoreCol).cast("double").as("__s"))
    val calA = nonconf(cal).groupBy("__a").agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__a"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = calA.agg(coalesce(sum("__c"), lit(0L)).as("__n"))
    val qhat = calA
      .withColumn("__cum", sum("__c").over(w))
      .crossJoin(broadcast(tot))
      .where(col("__cum") >=
        ceil((lit(1.0) - lit(alpha)) * (col("__n") + 1).cast("double")))
      .agg(min(col("__a")).as("qhat"), first(col("__n")).as("n_cal"),
        first(ceil((lit(1.0) - lit(alpha)) * (col("__n") + 1)
          .cast("double")).cast("long")).as("k"))
    nonconf(ev).crossJoin(broadcast(qhat))
      .agg(first(col("n_cal")).as("n_cal"), first(col("k")).as("k"),
        first(col("qhat")).as("qhat"),
        count(lit(1)).as("n_eval"),
        (sum(when(col("__a") <= col("qhat"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as("coverage"),
        ((sum(when(lit(1.0) - col("__s") <= col("qhat"), 1L).otherwise(0L)) +
          sum(when(col("__s") <= col("qhat"), 1L).otherwise(0L)))
          .cast("double") / count(lit(1)).cast("double"))
          .as("avg_set_size"))
  }

  /** [[splitConformal]] as DuckDB SQL: `calRel`/`evRel` are relations
    * (or parenthesized subqueries) with `sExpr`/`yExpr` over them.
    * Emits a full SELECT of the same one-row readout. */
  def splitConformalOracleSql(calRel: String, evRel: String,
                              sExpr: String, yExpr: String,
                              alpha: Double): String =
    s"""WITH caln AS (SELECT CASE WHEN CAST($yExpr AS BOOLEAN)
       |      THEN 1.0 - CAST($sExpr AS DOUBLE)
       |      ELSE CAST($sExpr AS DOUBLE) END AS a
       |  FROM $calRel
       |  WHERE ($sExpr) IS NOT NULL AND ($yExpr) IS NOT NULL),
       |cg AS (SELECT a, CAST(count(*) AS BIGINT) AS c
       |  FROM caln GROUP BY a),
       |tot AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n FROM cg),
       |cum AS (SELECT a, sum(c) OVER (ORDER BY a
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM cg),
       |qh AS (SELECT min(a) AS qhat, any_value(n) AS n_cal,
       |    any_value(CAST(ceil((CAST(1.0 AS DOUBLE) - CAST($alpha AS DOUBLE))
       |      * CAST(n + 1 AS DOUBLE)) AS BIGINT)) AS k
       |  FROM cum, tot
       |  WHERE cum >= ceil((CAST(1.0 AS DOUBLE) - CAST($alpha AS DOUBLE))
       |    * CAST(n + 1 AS DOUBLE))),
       |evn AS (SELECT CASE WHEN CAST($yExpr AS BOOLEAN)
       |      THEN 1.0 - CAST($sExpr AS DOUBLE)
       |      ELSE CAST($sExpr AS DOUBLE) END AS a,
       |    CAST($sExpr AS DOUBLE) AS s
       |  FROM $evRel
       |  WHERE ($sExpr) IS NOT NULL AND ($yExpr) IS NOT NULL)
       |SELECT any_value(n_cal) AS n_cal, any_value(k) AS k,
       |  any_value(qhat) AS qhat,
       |  CAST(count(*) AS BIGINT) AS n_eval,
       |  CAST(sum(CASE WHEN a <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) AS coverage,
       |  CAST(sum(CASE WHEN 1.0 - s <= qhat THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN s <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) AS avg_set_size
       |FROM evn, qh""".stripMargin

  // --------------------------------------------------------------------
  // Confident-learning joint (Northcutt et al. 2021, "Confident
  // Learning") — label-error mining for a noisily-labeled corpus: count
  // each example into a (noisy label, confident class) cell using
  // class-conditional mean-probability thresholds; off-diagonal mass is
  // the label-error estimate that decides whether a labeling pass gets
  // re-queued. Binary form over a P(class 1) score.
  // --------------------------------------------------------------------

  /** The confident joint for binary labels: thresholds t₁ = mean s over
    * y=1 and t₀ = mean (1−s) over y=0 (nano-quantized term sums →
    * exact), then each row is confidently class 1 if s ≥ t₁, class 0
    * if 1−s ≥ t₀, BOTH → the higher probability wins (s > 1−s),
    * neither → excluded. Output: (label, assigned, n) counts — the
    * off-diagonal cells are the estimated label errors.
    *
    * Scale: one grouped aggregate for the two thresholds (label-keyed,
    * two rows), broadcast back; one count aggregate over the corpus. */
  def confidentJointBinary(df: DataFrame, scoreCol: String,
                           labelCol: String): DataFrame = {
    val rows = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
    val thr = rows
      .select(col("__y"),
        when(col("__y"), col("__s")).otherwise(lit(1.0) - col("__s"))
          .as("__p"))
      .groupBy("__y")
      .agg((sum(floor(col("__p") * lit(1e9)).cast("long")).cast("double") /
        (count(lit(1)) * lit(1000000000L)).cast("double")).as("__t"))
    val t1 = thr.where(col("__y")).select(col("__t").as("__t1"))
    val t0 = thr.where(!col("__y")).select(col("__t").as("__t0"))
    val assigned = rows
      .crossJoin(broadcast(t1)).crossJoin(broadcast(t0))
      .select(col("__y").cast("long").as("label"),
        when((col("__s") >= col("__t1")) &&
          (lit(1.0) - col("__s") >= col("__t0")),
          when(col("__s") > lit(1.0) - col("__s"), 1L).otherwise(0L))
          .when(col("__s") >= col("__t1"), 1L)
          .when(lit(1.0) - col("__s") >= col("__t0"), 0L)
          .as("assigned"))
      .where(col("assigned").isNotNull)
    assigned.groupBy("label", "assigned").agg(count(lit(1)).as("n"))
  }

  /** [[confidentJointBinary]] as DuckDB SQL over `relation` with
    * `sExpr`/`yExpr`. Emits a full SELECT of (label, assigned, n). */
  def confidentJointOracleSql(relation: String, sExpr: String,
                              yExpr: String): String =
    s"""WITH r AS (SELECT CAST($sExpr AS DOUBLE) AS s,
       |    CAST($yExpr AS BOOLEAN) AS y
       |  FROM $relation
       |  WHERE ($sExpr) IS NOT NULL AND ($yExpr) IS NOT NULL),
       |thr AS (SELECT y,
       |    CAST(sum(CAST(floor((CASE WHEN y THEN s ELSE 1.0 - s END) * 1e9)
       |        AS BIGINT)) AS DOUBLE)
       |      / CAST(count(*) * 1000000000 AS DOUBLE) AS t
       |  FROM r GROUP BY y),
       |t1 AS (SELECT t AS t1 FROM thr WHERE y),
       |t0 AS (SELECT t AS t0 FROM thr WHERE NOT y),
       |asg AS (SELECT CAST(y AS BIGINT) AS label,
       |    CASE
       |      WHEN s >= t1 AND 1.0 - s >= t0
       |        THEN CASE WHEN s > 1.0 - s THEN 1 ELSE 0 END
       |      WHEN s >= t1 THEN 1
       |      WHEN 1.0 - s >= t0 THEN 0
       |    END AS assigned
       |  FROM r, t1, t0)
       |SELECT label, CAST(assigned AS BIGINT) AS assigned,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM asg WHERE assigned IS NOT NULL
       |GROUP BY label, assigned""".stripMargin
}
