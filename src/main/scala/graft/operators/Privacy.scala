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

  /** Laplace noise with scale `b`, keyed DETERMINISTICALLY on row
    * content: u = (md5Long48(key) + 0.5) / 2^48 ∈ (0,1) strictly, then
    * the Laplace inverse CDF −b·sign(u−½)·ln(1−2|u−½|). Every piece is
    * a codegen'd builtin with an engine-exact DuckDB twin
    * ([[laplaceNoiseSqlExpr]]).
    *
    * DP caveat (stated, not hidden): keying noise on (secret seed,
    * group key) makes this a PRF draw — the release is differentially
    * private only against adversaries WITHOUT the seed (computational
    * DP, the standard posture of every PRNG-based DP system; here the
    * PRG is md5 and the seed is the release secret). The determinism
    * is what buys reproducible releases, engine-exact oracle replay,
    * and partition-invariance; re-releasing the SAME statistic with
    * the same seed spends no extra budget (same draw), while a new
    * seed is a new release that composes additively. */
  def laplaceNoise(key: Column, scale: Double): Column = {
    require(scale > 0, s"scale must be > 0, got $scale")
    val u = (DetRandom.md5Long48(key).cast("double") + 0.5d) /
      281474976710656.0d // 2^48
    val d = u - 0.5d
    -lit(scale) * signum(d) * log(lit(1.0) - lit(2.0) * abs(d))
  }

  /** DuckDB twin of [[laplaceNoise]] — same 48-bit fold, same inverse
    * CDF, float ops within 1 ulp of Spark's (releases round to 6
    * decimals, far above that seam). */
  def laplaceNoiseSqlExpr(keySql: String, scale: Double): String = {
    require(scale > 0, s"scale must be > 0, got $scale")
    val u = s"(((${DetRandom.md5Long48SqlExpr(keySql)}) + 0.5) / 281474976710656.0)"
    s"(-($scale) * sign($u - 0.5) * ln(1.0 - 2.0 * abs($u - 0.5)))"
  }

  /** ε-differentially-private grouped release (Laplace mechanism) —
    * the statistical complement of the syntactic [[kAnonymityReport]]:
    * what a governance pipeline PUBLISHES about a corpus (per-group
    * document counts and a clipped value sum: language mix, domain
    * volume, token budgets) when the true counts themselves are
    * sensitive. Count sensitivity is 1 → scale 1/εc; the value column
    * clips to [lo, hi] FIRST (the caller-declared contribution bound —
    * without it a sum has unbounded sensitivity), giving sum
    * sensitivity max(|lo|, |hi|) → scale max/εs. The two epsilons
    * compose: the release costs εc + εs of budget per seed.
    *
    * Scale shape: ONE hash aggregate keyed on the group columns
    * (map-side partials), then model-sized map-only noise attachment —
    * the noise is a pure function of (seed, group key), so the release
    * is bit-stable across runs/partitionings and the oracle replays it
    * term for term. The clipped sum accumulates in DECIMAL(38,6)
    * (order-invariant exact integers), cast to double only at release.
    * Noisy counts can be negative — standard for Laplace releases;
    * post-hoc clamping is a caller-side post-processing choice (free
    * under DP). */
  def dpGroupRelease(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     lo: Double, hi: Double, epsCount: Double,
                     epsSum: Double, seed: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group column")
    require(epsCount > 0 && epsSum > 0,
      s"epsilons must be > 0, got $epsCount / $epsSum")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val clipped = least(greatest(col(valueCol), lit(lo)), lit(hi))
    val agg = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        coalesce(sum(clipped.cast(org.apache.spark.sql.types
          .DecimalType(38, 6))), lit(0).cast(org.apache.spark.sql.types
          .DecimalType(38, 6))).as("__s"))
    // NULL keys render as the sentinel on BOTH engines (concat_ws would
    // silently SKIP a NULL here while DuckDB's || nulls the whole key —
    // the one seam where the two would draw different noise); a real key
    // equal to the sentinel collides draws with the NULL class — noise
    // reuse across two groups, harmless to the mechanism
    def noiseKey(stat: String): Column =
      concat_ws("|", lit(seed) +: lit(stat) +:
        keyCols.map(c => coalesce(col(c).cast("string"),
          lit("<NULL>"))): _*)
    val sumScale = math.max(math.abs(lo), math.abs(hi)) / epsSum
    agg.select(keyCols.map(col) ++ Seq(
      (col("__n").cast("double") +
        laplaceNoise(noiseKey("n"), 1.0 / epsCount)).as("n_dp"),
      (col("__s").cast("double") +
        laplaceNoise(noiseKey("s"), sumScale)).as("sum_dp")): _*)
  }

  /** [[dpGroupRelease]] as DuckDB SQL over `relation`, single group
    * column `keyExpr AS keyName`, value expression `valueExpr` —
    * identical clip, identical DECIMAL(38,6) sum, identical noise
    * terms. Emits a full SELECT (keyName, n_dp, sum_dp). */
  def dpReleaseOracleSql(relation: String, keyExpr: String, keyName: String,
                         valueExpr: String, lo: Double, hi: Double,
                         epsCount: Double, epsSum: Double,
                         seed: String): String = {
    // same gate as the Spark twin: a bad configuration must fail HERE,
    // symmetrically, not surface as a confusing oracle data mismatch
    require(epsCount > 0 && epsSum > 0,
      s"epsilons must be > 0, got $epsCount / $epsSum")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    // the seed is caller data interpolated into a SQL literal — a
    // quote inside it must render as a literal quote ('' in SQL), not
    // malform the oracle while the Spark twin (a lit Column, immune)
    // keys on the raw value
    val seedLit = "'" + seed.replace("'", "''") + "'"
    def key(stat: String): String =
      s"$seedLit || '|' || '$stat' || '|' || " +
        s"COALESCE(CAST($keyName AS VARCHAR), '<NULL>')"
    val sumScale = math.max(math.abs(lo), math.abs(hi)) / epsSum
    val nNoise = laplaceNoiseSqlExpr(key("n"), 1.0 / epsCount)
    val sNoise = laplaceNoiseSqlExpr(key("s"), sumScale)
    s"""SELECT $keyName,
       |  CAST(n AS DOUBLE) + $nNoise AS n_dp,
       |  CAST(s AS DOUBLE) + $sNoise AS sum_dp
       |FROM (SELECT $keyExpr AS $keyName, count(*) AS n,
       |    COALESCE(sum(CAST(least(greatest($valueExpr, $lo), $hi)
       |      AS DECIMAL(38,6))), 0) AS s
       |  FROM $relation GROUP BY 1) g""".stripMargin
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
