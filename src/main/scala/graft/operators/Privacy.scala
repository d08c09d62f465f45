package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk screening for training corpora: k-anonymity and
  * l-diversity over quasi-identifier combinations (Sweeney 2002;
  * Machanavajjhala et al. 2007) — the governance question "can a row be
  * re-identified by joining these columns to an outside table, and does
  * its group leak the sensitive value?" asked of 100 TB the only way
  * that scales: as ONE grouped aggregate over the quasi-identifier key.
  *
  * The row-level scrubbers live in [[TextAnalysis]] (q_pii / q_scrub);
  * this is the dataset-level audit that decides whether a release needs
  * them — complement, not overlap. */
object Privacy {

  /** Per-equivalence-class k-anonymity/l-diversity report: one row per
    * distinct quasi-identifier combination with its class size `n`,
    * distinct-sensitive-value count `n_sensitive` (0 when
    * `sensitiveCol` is None), and the two verdicts — `k_anonymous`
    * (n ≥ k) and `l_diverse` (n_sensitive ≥ l; vacuously true with no
    * sensitive column). NULL quasi values form their own class (SQL
    * GROUP BY semantics on both engines); NULL sensitive values don't
    * count toward diversity (COUNT DISTINCT skips them).
    *
    * Scale shape: ONE hash aggregate keyed on the quasi columns — the
    * exact-distinct forces no second pass (partial aggregation handles
    * it); output is equivalence-class-sized, not corpus-sized. The
    * report is the artifact a release review reads; enforcement is
    * [[suppressBelowK]]. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: Option[String], k: Int,
                       l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    val nSens = sensitiveCol
      .map(c => countDistinct(col(c)))
      .getOrElse(lit(0L)).as("n_sensitive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"), nSens)
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse",
        if (sensitiveCol.isDefined) col("n_sensitive") >= l else lit(true))
  }

  /** k-anonymity ENFORCEMENT by suppression: drop every row whose
    * quasi-identifier equivalence class has fewer than `k` members —
    * the blunt-but-sound baseline (generalization hierarchies are a
    * modeling choice; suppression is mechanical and auditable).
    *
    * Shape: class sizes via one grouped aggregate (map-side partials),
    * then the SURVIVING classes join back onto the corpus null-safely.
    * NOT a `count() OVER (PARTITION BY quasi)` window: a
    * low-cardinality quasi key (a handful of demographic buckets — the
    * common audit shape) would funnel the entire corpus into
    * |classes| sorted tasks at any cluster size, where the join-back
    * lets AQE broadcast the class table and keep the corpus pass
    * map-only; a high-cardinality key degrades to an ordinary keyed
    * shuffle join. Null-safe equality keeps NULL classes (they are
    * classes too — a plain column join would silently drop them). */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String],
                     k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val survivors = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= k)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(survivors, cond, "inner")
      .drop(quasiCols.map(c => s"__q_$c"): _*)
  }

  /** [[kAnonymityReport]] as DuckDB SQL over `relation`. `quasi` are
    * raw SQL expressions aliased to the same names the Spark side
    * groups by. */
  def kAnonymityOracleSql(relation: String, quasi: Seq[(String, String)],
                          sensitive: String, k: Int, l: Int): String = {
    val sel = quasi.map { case (e, a) => s"$e AS $a" }.mkString(", ")
    val names = quasi.map(_._2).mkString(", ")
    s"""WITH g AS (SELECT $sel, count(*) AS n,
       |    count(DISTINCT $sensitive) AS n_sensitive
       |  FROM $relation GROUP BY $names)
       |SELECT $names, n, n_sensitive,
       |  n >= $k AS k_anonymous, n_sensitive >= $l AS l_diverse
       |FROM g""".stripMargin
  }
}
