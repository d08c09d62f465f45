package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sampling operators for training-data pipelines. */
object Sampling {

  /** Exclusive per-key prefix sum of `tokenCol` in the stable
    * (md5(id), id) order — the running total every budget sampler below
    * gates on — WITHOUT `Window.partitionBy(key)`: sampling keys are
    * routinely a handful of languages/sources, and a window over such a
    * key funnels the whole corpus into |keys| sorted tasks at any
    * cluster size.
    *
    * Distributed two-pass prefix sum instead, with md5-PREFIX
    * sub-buckets as the parallelism dial: the first two hex chars of
    * md5(id) define 256 contiguous, uniformly-filled ranges of the sort
    * order (lexicographic hex order == numeric prefix order), so
    *   1. ONE hash exchange on (key, bucket) — |keys|×256 real
    *      partitions — computes the local exclusive prefix per bucket;
    *   2. per-(key, bucket) totals (map-side partials) feed a window
    *      over the ≤ |keys|×256-row totals relation for the per-bucket
    *      starting offsets, broadcast-joined back.
    * global prefix = local prefix + bucket offset, an exact integer
    * identity — bit-identical to the single-window formulation at every
    * row, deterministic across runs, engines and cluster sizes (no
    * range-partitioner sampling involved). Same exchange count as the
    * naive window; 256× its worst-case parallelism. */
  private def keyedPrefixSum(df: DataFrame, keyCols: Seq[String],
                             idCol: String, tokenExpr: Column,
                             outCol: String): DataFrame = {
    val ord = md5(col(idCol).cast("string"))
    val bucket = conv(substring(ord, 1, 2), 16, 10).cast("int")
    val wLocal = Window.partitionBy((keyCols :+ "__pb").map(col): _*)
      .orderBy(ord, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = df.withColumn("__pb", bucket)
      .withColumn("__loc", coalesce(sum(tokenExpr).over(wLocal), lit(0L)))
    val wOff = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.withColumn("__pb", bucket)
      .groupBy((keyCols :+ "__pb").map(col): _*)
      .agg(sum(tokenExpr).as("__pt"))
      .withColumn("__po", coalesce(sum(col("__pt")).over(wOff), lit(0L)))
      .select((keyCols :+ "__pb").map(col) :+ col("__po"): _*)
    // null-safe join-back: the single-window formulation this replaces
    // kept a NULL key (or the NULL md5 bucket of a NULL id) as its own
    // partition; a plain-equality join would silently DROP those rows
    val offRenamed = offsets.select(
      keyCols.map(c => col(c).as(s"__ok_$c")) ++
        Seq(col("__pb").as("__opb"), col("__po")): _*)
    val cond = (keyCols.map(c => col(c) <=> col(s"__ok_$c")) :+
      (col("__pb") <=> col("__opb"))).reduce(_ && _)
    local.join(broadcast(offRenamed), cond)
      .withColumn(outCol, col("__loc") + col("__po"))
      .drop(keyCols.map(c => s"__ok_$c"): _*)
      .drop("__opb", "__pb", "__loc", "__po")
  }

  /** Deterministic per-key sample: n rows per key, chosen by a stable
    * pseudo-random order (md5 of the id rendered as text — reproducible
    * across engines and runs, unlike rand()). Routed through the
    * distributed prefix machinery ([[keyedPrefixSum]] with a count of 1
    * per row — `rank = exclusive count + 1`), so a handful-of-values
    * key never collapses parallelism. */
  def perKey(df: DataFrame, keys: Seq[String], idCol: String, n: Int): DataFrame =
    keyedPrefixSum(df, keys, idCol, lit(1L), "__rn0")
      .where(col("__rn0") < n)
      .drop("__rn0")

  /** Stratified Bernoulli sample with per-stratum fractions (seeded
    * sampleBy — deterministic for a fixed seed and input partitioning;
    * use [[perKey]] when cross-run exactness matters). */
  def stratified(df: DataFrame, strataCol: String,
                 fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Deterministic global shuffle for training-data ordering: total order
    * by a stable hash of the id. A range-partitioned sort — parallel,
    * reproducible across runs and engines (md5, not rand). */
  def deterministicShuffle(df: DataFrame, idCol: String): DataFrame =
    df.orderBy(md5(col(idCol).cast("string")), col(idCol))

  /** Token-budget stratified sample — the data-mixture curation step:
    * per key (language, source, ...), keep documents in a stable
    * md5-pseudo-random order until the key's token budget is reached
    * (first doc crossing the budget is INCLUDED: every non-empty key
    * yields at least one doc and budgets are met, not undershot). One
    * (key, md5-bucket) exchange via [[keyedPrefixSum]]'s distributed
    * prefix sum, integer running sums — deterministic
    * across runs and engines, unlike fraction-based sampling, and it
    * targets what mixture weights actually mean: tokens, not rows. */
  def budgetSample(df: DataFrame, keyCol: String, idCol: String,
                   tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    keyedPrefixSum(df, Seq(keyCol), idCol, col(tokenCol), "__off")
      .where(col("__off") < budget)
      .drop("__off")
  }

  /** Domain-mixture sampling to TARGET PROPORTIONS — the curation step
    * that turns mixture weights (DoReMi-style: "50% en, 20% code, …")
    * into a concrete keep set. Each key's token budget is
    * floor(totalBudget × weight); within a key, documents are taken in
    * the same stable md5-pseudo-random order as [[budgetSample]] until
    * the key's budget is reached (first doc crossing it INCLUDED, so
    * budgets are met, not undershot; an under-supplied domain simply
    * contributes everything it has). Keys absent from `weights` get
    * budget 0 and are excluded entirely — unlisted domains are a
    * deliberate drop, not a passthrough.
    *
    * `weights` is an ordered Seq (not a Map) so the generated when-chain
    * — and therefore the plan — is deterministic across runs. One
    * (key, md5-bucket) exchange ([[keyedPrefixSum]]), integer running
    * sums; membership is
    * recomputable from (id, weights) alone, so the same mixture is
    * reproducible on any engine or cluster size. */
  def mixtureSample(df: DataFrame, keyCol: String, idCol: String,
                    tokenCol: String, totalBudget: Long,
                    weights: Seq[(String, Double)]): DataFrame = {
    require(totalBudget > 0, "token budget must be positive")
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0),
      "weights must be non-empty and non-negative")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate keys in mixture weights")
    val budget = weights.tail.foldLeft(
      when(col(keyCol) === weights.head._1,
        lit((totalBudget * weights.head._2).toLong))) {
      case (acc, (k, wt)) =>
        acc.when(col(keyCol) === k, lit((totalBudget * wt).toLong))
    }.otherwise(lit(0L))
    keyedPrefixSum(df.withColumn("__budget", budget),
      Seq(keyCol), idCol, col(tokenCol), "__off")
      .where(col("__off") < col("__budget"))
      .drop("__budget", "__off")
  }

  /** Temperature-based mixture sampling — the multilingual-corpus recipe
    * (weight ∝ tokens^α with α < 1 up-weighting low-resource domains;
    * XLM-R and mT5 train with α ≈ 0.3, many English-centric mixes use
    * 0.5): per-key budgets are DERIVED FROM THE DATA as
    * floor(totalBudget × w_k / Σ w_j), then the same stable-md5-order
    * budget keep as [[mixtureSample]]. The weight table is a tiny
    * per-key aggregate computed on the cluster and broadcast back —
    * nothing driver-resident, so the op is one plan at any corpus size.
    *
    * Engine-exactness: w_k is quantized to floor(tok^α × 1e6) as a LONG
    * before the Σ w_j aggregate — an integer sum is association-order-
    * exact, where a double sum's value depends on partition order. The
    * budget expression is then a fixed tree of IEEE double ops
    * (deterministic), and α = 0.5 routes through sqrt(), which IEEE 754
    * requires to be correctly rounded — bit-identical across engines,
    * so the α = 0.5 path is hash-oracle-safe end to end. Other α use
    * pow() (1-ulp: fine for production, not for cross-engine hash
    * gates). */
  def temperatureMixture(df: DataFrame, keyCol: String, idCol: String,
                         tokenCol: String, totalBudget: Long,
                         alpha: Double = 0.5): DataFrame = {
    require(totalBudget > 0, "token budget must be positive")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    val powCol: Column => Column =
      if (alpha == 0.5) sqrt(_) else c => pow(c, lit(alpha))
    val keyW = df.groupBy(keyCol)
      .agg(sum(col(tokenCol)).cast("double").as("__tok"))
      .select(col(keyCol),
        floor(powCol(col("__tok")) * 1e6).cast("long").as("__wi"))
    val wsum = keyW.agg(sum("__wi").as("__wsum"))
    val budgets = keyW.crossJoin(broadcast(wsum))
      .select(col(keyCol),
        floor(lit(totalBudget).cast("double") * col("__wi").cast("double")
          / col("__wsum").cast("double")).cast("long").as("__budget"))
    keyedPrefixSum(df.join(broadcast(budgets), Seq(keyCol)),
      Seq(keyCol), idCol, col(tokenCol), "__off")
      .where(col("__off") < col("__budget"))
      .drop("__budget", "__off")
  }

  /** Deterministic weighted sample without replacement (Efraimidis–
    * Spirakis A-ES): each row gets key = ln(u)/w with u a stable
    * md5-derived uniform in (0,1], and the k LARGEST keys win — heavier
    * rows sit nearer 0, so selection probability is proportional to
    * weight. Plans as TakeOrderedAndProject (per-partition heaps, no
    * global sort); reproducible across engines and runs because u comes
    * from md5(id), not rand(). Weights must be positive. */
  /** Deterministic train/val/test split assignment: each row's id hashes
    * to a stable uniform in [0, 1) (md5-derived — reproducible across
    * engines, runs and cluster sizes, unlike rand()), then a cumulative-
    * fraction when-chain labels it. Pure projection: no shuffle, no state,
    * no sampling pass — the split of 100 TB costs one map over the data,
    * and membership is recomputable from the id alone. */
  def splitAssign(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double")
    val u = h / 4294967296.0 // [0, 1): 32-bit prefix / 2^32
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val chain = splits.init.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), c)) =>
        Some(acc.fold(when(u < c, label))(_.when(u < c, label)))
    }
    df.withColumn(outCol,
      chain.fold(lit(splits.last._1))(_.otherwise(splits.last._1)))
  }

  /** Fractional-epoch oversampling — the "2.3 epochs of wikipedia, 0.7
    * of CommonCrawl" primitive of LLM training-data recipes, the
    * OVERsampling complement of [[mixtureSample]]'s budget
    * subsampling: every row of key k repeats ⌊e_k⌋ times, plus one more
    * copy for a deterministic md5-chosen frac(e_k) share of the key's
    * rows — so the realized multiplicity of key k converges to e_k with
    * zero RNG (membership of the extra copy is recomputable from the
    * row id alone). Keys absent from `epochs` get 0 — a deliberate
    * drop, exactly [[mixtureSample]]'s convention. Each copy carries a
    * 0-based `epoch` index so a downstream global shuffle can
    * interleave copies instead of concatenating epochs.
    *
    * Engine-exactness: the extra-copy draw is an INTEGER comparison —
    * md5Long48(id|epoch|key) < ⌊frac(e_k)·2^48⌋, both sides exact
    * literals — no float seam for the oracle to miss by an ulp.
    *
    * Scale shape: pure map-side explode — no shuffle, no state; each
    * task expands its own rows, output is Σ_k e_k·|k| rows by
    * construction. The 100 TB note worth stating: expansion multiplies
    * the SCAN's output, not the storage — feed it into the shuffle/
    * write stage that consumes the mixture, never materialize the
    * expanded corpus to disk unless the trainer requires it. */
  def epochExpand(df: DataFrame, keyCol: String, idCol: String,
                  epochs: Seq[(String, Double)],
                  outCol: String = "epoch"): DataFrame = {
    require(epochs.nonEmpty && epochs.forall(_._2 >= 0.0),
      "epoch weights must be non-empty and non-negative")
    require(epochs.map(_._1).distinct.size == epochs.size,
      "duplicate keys in epoch weights")
    require(!df.columns.contains(outCol) && !df.columns.contains("__copies"),
      s"input already has a '$outCol' or '__copies' column")
    // NULL ids coalesce to a sentinel (concat_ws would silently SKIP
    // the NULL — every null-id row of a key would then share ONE
    // extra-copy draw, and DuckDB's || would NULL the whole key: two
    // engines, two behaviors). With the sentinel both twins draw the
    // same per-row key; null-id rows still share a draw WITHIN a key
    // (they are indistinguishable by construction), which the oracle
    // now reproduces exactly
    val draw = DetRandom.md5Long48(concat_ws("|",
      coalesce(col(idCol).cast("string"), lit("<NULL>")),
      lit("epoch"), col(keyCol)))
    def copiesOf(e: Double): Column = {
      val full = math.floor(e).toLong
      val thresh = ((e - full) * 281474976710656.0).toLong // frac·2^48
      lit(full) + (draw < lit(thresh)).cast("long")
    }
    val chain = epochs.tail.foldLeft(
      when(col(keyCol) === epochs.head._1, copiesOf(epochs.head._2))) {
      case (acc, (k, e)) => acc.when(col(keyCol) === k, copiesOf(e))
    }.otherwise(lit(0L))
    df.withColumn("__copies", chain)
      .where(col("__copies") > 0L)
      .select(df.columns.map(col) :+
        explode(sequence(lit(0L), col("__copies") - 1L)).as(outCol): _*)
  }

  /** DuckDB oracle twin of [[epochExpand]] as a full SELECT over
    * `relation`: same integer threshold draw, same per-key CASE,
    * UNNEST(range(copies)) for the epoch index. `idExpr`/`keyName` are
    * the id expression and key column name; emits every `relation`
    * column plus `epoch`. */
  def epochExpandOracleSql(relation: String, keyName: String,
                           idExpr: String,
                           epochs: Seq[(String, Double)],
                           outCol: String = "epoch"): String = {
    val draw = DetRandom.md5Long48SqlExpr(
      s"COALESCE(CAST($idExpr AS VARCHAR), '<NULL>') || '|epoch|' || $keyName")
    val cases = epochs.map { case (k, e) =>
      val full = math.floor(e).toLong
      val thresh = ((e - full) * 281474976710656.0).toLong
      s"WHEN $keyName = '${k.replace("'", "''")}' THEN $full + " +
        s"(CASE WHEN ($draw) < $thresh THEN 1 ELSE 0 END)"
    }.mkString(" ")
    s"""SELECT * EXCLUDE (__copies), UNNEST(range(__copies)) AS $outCol
       |FROM (SELECT *, CAST((CASE $cases ELSE 0 END) AS BIGINT)
       |    AS __copies FROM $relation) e
       |WHERE __copies > 0""".stripMargin
  }

  /** Leakage-safe train/val/test split: near-duplicates must land in the
    * SAME split, or evaluation on the held-out slice silently measures
    * memorization of the training slice. Group key = connected-component
    * label of the duplicate-pair graph ([[Dedup.duplicateClusters]]);
    * rows in no pair keep their own id as the key. The md5 when-chain of
    * [[splitAssign]] then hashes the GROUP key, so a whole near-dup
    * cluster moves as one unit and membership is still recomputable from
    * (id, cluster label) alone.
    *
    * Scale shape: the cluster table is (id, label) for paired ids only —
    * tiny next to the corpus (and the CC iteration is scratch-parquet
    * bounded); the corpus-side cost is one left join on the id plus the
    * same zero-shuffle projection as splitAssign. */
  def leakageSafeSplit(df: DataFrame, idCol: String,
                       pairs: DataFrame, aCol: String, bCol: String,
                       splits: Seq[(String, Double)],
                       outCol: String = "split",
                       maxIter: Int = 20,
                       scratchDir: Option[String] = None): DataFrame = {
    val keyed = clusterKeyed(df, idCol, pairs, aCol, bCol, maxIter, scratchDir)
    splitAssign(keyed, "__gkey", splits, outCol).drop("__gkey")
  }

  /** The shared leakage-safety scaffold: CC-label the duplicate-pair
    * graph, left-join the labels onto the corpus, and expose ONE group
    * key `__gkey` (cluster label, or the row's own id when unpaired)
    * for a downstream hash assignment to draw on. Single seam for both
    * [[leakageSafeSplit]] and [[leakageSafeKFold]] — a fix to the
    * cluster join (label typing, null handling) lands in both. */
  private def clusterKeyed(df: DataFrame, idCol: String, pairs: DataFrame,
                           aCol: String, bCol: String, maxIter: Int,
                           scratchDir: Option[String]): DataFrame = {
    val clusters = Dedup.duplicateClusters(pairs, aCol, bCol, maxIter, scratchDir)
      .select(col("node").as(idCol), col("label").as("__cc_label"))
    df.join(clusters, Seq(idCol), "left")
      .withColumn("__gkey", coalesce(col("__cc_label"), col(idCol)))
      .drop("__cc_label")
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * md5-32-bit-prefix(id) mod k — [[splitAssign]]'s stable uniform
    * reused as a residue, so folds are engine/run/cluster-reproducible,
    * membership is recomputable from the id alone, and the assignment
    * is one map-side projection over 100 TB (no shuffle, no sampling
    * pass). Folds are equal in EXPECTATION (multinomial, like any
    * hash split), not exactly equal-sized. */
  def kFold(df: DataFrame, idCol: String, k: Int,
            outCol: String = "fold"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.withColumn(outCol, (h % k).cast("int"))
  }

  /** Leakage-safe [[kFold]]: near-duplicate clusters ride ONE md5 draw
    * (the [[leakageSafeSplit]] machinery — CC label as the fold key),
    * so duplicates never straddle a fold boundary and k-fold CV never
    * evaluates on a near-copy of a training row. Corpus cost beyond the
    * CC on the PAIRED ids: one left join + the zero-shuffle fold
    * projection. */
  def leakageSafeKFold(df: DataFrame, idCol: String,
                       pairs: DataFrame, aCol: String, bCol: String,
                       k: Int, outCol: String = "fold",
                       maxIter: Int = 20,
                       scratchDir: Option[String] = None): DataFrame = {
    val keyed = clusterKeyed(df, idCol, pairs, aCol, bCol, maxIter, scratchDir)
    kFold(keyed, "__gkey", k, outCol).drop("__gkey")
  }

  def weighted(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double")
    val u = (h + 1.0) / 4294967297.0 // (0, 1]: (2^32 max + 1) / (2^32 + 1)
    df.withColumn("__wkey", log(u) / col(weightCol))
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  // --------------------------------------------------------------------
  // Neyman-allocation stratified sampling (Neyman 1934) — the
  // variance-OPTIMAL way to spend a fixed row budget across strata:
  // n_h ∝ N_h·σ_h, so high-variance strata get proportionally more of
  // the budget and the stratified-mean estimator's variance is
  // minimized. The statistically-grounded upgrade of proportional
  // sampling for profiling/eval at corpus scale. Every step is exact:
  // nano-quantized moment sums in decimal, allocation by INTEGER
  // division, membership by md5 rank.
  // --------------------------------------------------------------------

  /** Sample ~`budget` rows across the strata of `stratumCol`,
    * allocating n_h = ⌊budget·w_h / Σw_h⌋ with w_h = ⌊10⁶·N_h·σ_h⌋
    * (population σ over `valueCol`, computed from exact nano-quantized
    * Σv/Σv² in decimal(38,0) — corpus-scale-safe). Zero-variance
    * strata get allocation 0 (their mean is already exact from any
    * single row — the Neyman edge case, documented not patched).
    * Within a stratum the kept rows are the md5-first n_h (stable
    * pseudo-random order, engine-exact).
    *
    * Scale: one grouped moment aggregate (stratum-keyed), one
    * strata-sized total, broadcast back; ONE stratum-key window ranks
    * the corpus. Output: df columns + (n_stratum, sigma, alloc). */
  def neymanSample(df: DataFrame, stratumCol: String, valueCol: String,
                   idCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val q = floor(col(valueCol).cast("double") * lit(1e9)).cast("long")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val stats = df
      .select(col(stratumCol).as("__st"), q.as("__q"))
      .groupBy("__st")
      .agg(count(lit(1)).as("__n"), sum(d38(col("__q"))).as("__sv"),
        sum(d38(col("__q")) * d38(col("__q"))).as("__sv2"))
      .select(col("__st"), col("__n"),
        (sqrt((d38(col("__n")) * col("__sv2") - col("__sv") * col("__sv"))
          .cast("double")) /
          (col("__n").cast("double") * lit(1e9))).as("__sigma"))
      .select(col("__st"), col("__n"), col("__sigma"),
        floor(col("__n").cast("double") * col("__sigma") * lit(1e6))
          .cast("long").as("__w"))
    val tot = stats.agg(coalesce(sum("__w"), lit(0L)).as("__tw"))
    val alloc = stats.crossJoin(broadcast(tot))
      .select(col("__st"), col("__n").as("n_stratum"),
        col("__sigma").as("sigma"),
        when(col("__tw") > 0,
          expr(s"($budget * __w) div __tw")).otherwise(lit(0L))
          .as("alloc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(alloc),
        col(stratumCol) === col("__st"), "inner")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("alloc"))
      .drop("__st", "__rn")
  }

  /** [[neymanSample]] as DuckDB SQL over `relation`: same quantized
    * moments, same integer allocation, same md5 ranking. Emits a full
    * SELECT of (stratum, id, n_stratum, sigma, alloc). */
  def neymanOracleSql(relation: String, stratumExpr: String,
                      valueExpr: String, idExpr: String,
                      budget: Long): String =
    s"""WITH r AS (SELECT $stratumExpr AS st, $idExpr AS id,
       |    CAST(floor(CAST($valueExpr AS DOUBLE) * 1e9) AS BIGINT) AS q
       |  FROM $relation),
       |st AS (SELECT st, CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(q AS HUGEINT)) AS sv,
       |    sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS sv2
       |  FROM r GROUP BY st),
       |sig AS (SELECT st, n,
       |    sqrt(CAST(CAST(n AS HUGEINT) * sv2 - sv * sv AS DOUBLE))
       |      / (CAST(n AS DOUBLE) * 1e9) AS sigma
       |  FROM st),
       |wt AS (SELECT st, n, sigma,
       |    CAST(floor(CAST(n AS DOUBLE) * sigma * 1e6) AS BIGINT) AS w
       |  FROM sig),
       |tw AS (SELECT CAST(COALESCE(sum(w), 0) AS BIGINT) AS tw FROM wt),
       |alloc AS (SELECT st, n AS n_stratum, sigma,
       |    CASE WHEN tw > 0 THEN ($budget * w) // tw ELSE 0 END AS alloc
       |  FROM wt, tw),
       |ranked AS (SELECT r.st, r.id, a.n_stratum, a.sigma, a.alloc,
       |    row_number() OVER (PARTITION BY r.st
       |      ORDER BY md5(CAST(r.id AS VARCHAR)), r.id) AS rn
       |  FROM r JOIN alloc a ON r.st = a.st)
       |SELECT st, id, n_stratum, sigma, alloc
       |FROM ranked WHERE rn <= alloc""".stripMargin
}
