package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine linear-model training — the gradient-descent counterpart
  * of [[TextAnalysis.nbTrain]]'s counting classifier: a pipeline trains
  * a logistic quality/domain filter on a labeled sub-corpus of dense
  * features (embeddings) and applies it to the whole crawl, without
  * leaving the engine or shipping data to a separate trainer.
  *
  * Determinism contract (the repo-wide rule): nothing float is ever
  * summed raw. Every cross-row gradient sum casts its per-row term to
  * DECIMAL(38,18) first (exact, order-invariant addition — the
  * [[Similarity.powerIteration]] recipe), and the weight vector
  * re-quantizes to the 1e-9 grid after every update, so the whole
  * training trajectory is bit-replayable by the DuckDB oracle and
  * invariant to partitioning. In-row dot products fold element-wise in
  * array order through the same DECIMAL cast — formulation-independent,
  * which is what lets the Spark side aggregate 64 columns wide while
  * the oracle aggregates an exploded (row, pos) relation.
  *
  * Scale shape: ONE whole-stage-codegen aggregate over the corpus per
  * iteration — (dim+2) decimal accumulators, map-side partials, no
  * explode amplification and no row-key self-join (the z relation never
  * materializes; σ(z) folds inside the same projection that feeds the
  * aggregate). The model hops between iterations as a one-row broadcast.
  * Training cost is honestly iters × (one cached-corpus pass + one
  * 64-ary aggregate); each fit persists its training relation
  * internally for the loop's lifetime (into the caller's
  * [[CacheScope]] when one is given), with partitions sized to the
  * data and AQE parked across the loop's fixed micro-plans (SCALE.md
  * round-11: the per-iteration floor was task scheduling, not math).
  */
object LinearModel {

  private val dec = "decimal(38,18)"

  /** Quantize a double column to the 1e-9 grid (exactly representable;
    * both engines floor the same double). */
  private def q9(c: Column): Column = floor(c * lit(1e9)) / lit(1e9)

  /** Exact in-row dot product: element-wise products cast to
    * DECIMAL(38,18), folded in array order, one cast back. */
  private def dotDec(x: Column, w: Column): Column =
    aggregate(zip_with(x, w, (a, b) => (a.cast("double") * b).cast(dec)),
      lit(0).cast(dec), (acc, t) => (acc + t).cast(dec)).cast("double")

  /** `iters` full-batch gradient-descent steps of L2-free logistic
    * regression on `(vecCol: array<float/double>[dim], labelCol ∈
    * {0,1})`, learning rate `lr`, zero-initialized weights and bias.
    * Returns the weight relation: (pos, weight) with pos 1..dim and
    * pos 0 = bias — every weight exactly on the 1e-9 grid.
    *
    * Gradient: ∇_j = Σ_rows (σ(z)−y)·x_j, z = w·x + b, each term
    * DECIMAL-cast before the sum; update w_j ← q9(w_j − lr·∇_j/n). */
  def logisticFit(points: DataFrame, vecCol: String, labelCol: String,
                  dim: Int, iters: Int = 5, lr: Double = 0.5,
                  scope: Option[CacheScope] = None): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1,16], got $iters")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val spark = points.sparkSession
    import spark.implicits._
    val pts0 = points.select(col(vecCol).as("__x"),
      col(labelCol).cast("double").as("__y"))
    // the loop is eager and owns its actions, so the training relation
    // persists internally (into the caller's scope when one is given):
    // without it every iteration re-reads the source. Partitions are
    // sized to the data (~32k rows each, capped at session parallelism)
    // — the sparse form's measured lesson: a fixed wide layout bills
    // each iteration dozens of near-empty task launches.
    val rows = pts0.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      (rows + 32767L) / 32768L)).toInt
    val repart = pts0.repartition(parts)
    val pts = scope.fold(
      repart.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))(
      _.cache(repart))
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey, "true")
    // the parameter-server-lite loop: the model rides IN as a one-row
    // broadcast of DATA (never per-iteration literals — the generated
    // whole-stage source stays bit-identical across iterations, so the
    // gradient aggregate codegen-compiles ONCE) and the dim+2 gradient
    // doubles hop back to the driver per step — bounded by dim, never
    // by the corpus. The driver-side update replays the exact q9 IEEE
    // sequence ((lr·∇)/n, one floor per weight) the Catalyst form used,
    // so trajectories are unchanged.
    val w = Array.fill(dim)(0.0)
    var b = 0.0
    try {
      // AQE off for the loop's fixed micro-plans (restored after) —
      // nothing to re-plan, and its per-stage materialization billed
      // measurable overhead per step at bench scale
      spark.conf.set(aqeKey, "false")
      for (_ <- 1 to iters) {
        val model = broadcast(Seq((w.toSeq, b)).toDF("__w", "__b"))
        val z = dotDec(col("__x"), col("__w")) + col("__b")
        val s = lit(1.0) / (lit(1.0) + exp(-z))
        val gradCols = (1 to dim).map { j =>
          sum(((s - col("__y")) * element_at(col("__x"), j).cast("double"))
            .cast(dec)).cast("double").as(s"__g$j")
        } ++ Seq(
          sum((s - col("__y")).cast(dec)).cast("double").as("__gb"),
          count(lit(1)).as("__n"))
        val row = pts.crossJoin(model)
          .agg(gradCols.head, gradCols.tail: _*)
          .head()
        val n = row.getLong(dim + 1).toDouble
        for (j <- 1 to dim)
          w(j - 1) =
            math.floor((w(j - 1) - lr * row.getDouble(j - 1) / n) * 1e9) / 1e9
        b = math.floor((b - lr * row.getDouble(dim) / n) * 1e9) / 1e9
      }
    } finally {
      spark.conf.set(aqeKey, aqeWas)
      if (scope.isEmpty) pts.unpersist(blocking = false)
    }
    // pos contract: 0 = bias, j = w_j
    (0 to dim).map(j => (j, if (j == 0) b else w(j - 1)))
      .toDF("pos", "weight")
  }

  /** Score `points` under a fitted weight relation (the
    * [[logisticFit]] output, broadcast): per-row σ(w·x+b) and the 0.5
    * decision — then fold to a (label, pred) confusion with one count
    * aggregate. The weight relation re-assembles to an array via a
    * bounded sort-collect (dim+1 rows by contract). */
  def logisticConfusion(points: DataFrame, vecCol: String,
                        labelCol: String, weights: DataFrame): DataFrame = {
    val wArr = weights
      .agg(sort_array(collect_list(struct(col("pos"), col("weight"))))
        .as("__a"))
      .select(
        filter(col("__a"), e => e.getField("pos") > 0)
          .cast("array<struct<pos:int,weight:double>>").getField("weight")
          .as("__w"),
        element_at(filter(col("__a"), e => e.getField("pos") === 0), 1)
          .getField("weight").as("__b"))
    val z = dotDec(col(vecCol), col("__w")) + col("__b")
    points.crossJoin(broadcast(wArr))
      .select(col(labelCol).cast("long").as("label"),
        (z > 0.0).cast("int").as("pred"))
      .groupBy("label", "pred").agg(count(lit(1)).as("n"))
  }

  /** [[logisticFit]] for SPARSE features: `pairs` is the exploded
    * (idCol, posCol ∈ 1..dim, xCol, yCol) relation — absent positions
    * are implicit zeros, which add exact zero under the per-term
    * DECIMAL sums, so the trajectory is identical to the dense form on
    * the densified data. The right shape for text: hashed-TF at
    * dim ≥ 256 with ~tens of non-zeros per doc would pay O(dim)
    * per-row work and an O(dim·iters) Catalyst plan in the dense form;
    * here per-iteration work is O(nnz) and the plan is O(1) per
    * iteration.
    *
    * Scale: per iteration, ONE action and ONE fused pipeline over the
    * cached corpus with a single model-sized exchange. The pairs
    * relation persists PRE-PARTITIONED on the doc key into
    * DATA-SIZED partitions (≈500k rows each, capped at the session
    * parallelism — a fixed 32/200-partition layout bills every
    * iteration ~64 near-empty task launches, which WAS the dominant
    * cost at bench scale: the round-10 profile showed a plain
    * aggregate over the same cache costing 0.3 s of pure scheduling).
    * Inside one pass: σ(z)−y attaches per ROW via a window sum over
    * the pre-partitioned doc key (no zrel join-back — two corpus
    * exchanges deleted), the per-pos gradient aggregate folds it, and
    * the weight update itself rides the same aggregate (the joined
    * weight is constant per pos, so max() carries it through and the
    * q9 floor applies in-plan — floor(x·1e9)::double/1e9 is the
    * identical IEEE sequence the driver replayed before, proven by
    * the unchanged sparse≡dense spec and DuckDB oracle). The driver
    * hop per iteration is the UPDATED MODEL itself (dim+1 doubles —
    * parameter-server-lite), which re-enters as a broadcast relation,
    * so generated code stays bit-identical across iterations and the
    * codegen cache compiles the loop body once.
    *
    * One synthetic (null-doc, pos, null-x) sentinel row per pos keeps
    * every pos alive through the inner weight join (null terms add
    * nothing: SQL sum skips them, exactly as getOrElse(0.0) did); the
    * bias is carried as a synthetic pos-0 / x=1 row per doc, so its
    * gradient Σ(σ(z)−y)·1 falls out of the SAME per-pos aggregate
    * instead of a second full corpus pass (z's decimal sum folds ONLY
    * pos>0 terms; the bias re-enters as the identical trailing DOUBLE
    * add via the pos-0 row's joined weight).
    *
    * AQE is disabled for the loop's micro-queries (and restored
    * after): the per-iteration plan is fixed and tiny, and AQE's
    * per-stage materialization billed ~40% overhead per step at bench
    * scale while having nothing to re-plan. Output: (pos, weight),
    * pos 0 = bias. */
  def logisticFitSparse(pairs0: DataFrame, idCol: String, posCol: String,
                        xCol: String, yCol: String, dim: Int,
                        iters: Int = 5, lr: Double = 0.5): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1,64], got $iters")
    require(dim >= 1 && dim <= (1 << 20), s"dim must be in [1,2^20], got $dim")
    val spark = pairs0.sparkSession
    import spark.implicits._
    // the featurization is consumed three times before the loop (nnz
    // count, bias derivation, the union itself) — cache it transiently
    // UNLESS the caller already persisted pairs0 (then the upstream is
    // already a cache read and a second copy only costs memory + a
    // warm-up pass)
    val callerCached =
      pairs0.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val feats0sel = pairs0.select(col(idCol).as("__id"),
      col(posCol).cast("int").as("__pos"),
      col(xCol).cast("double").as("__x"),
      col(yCol).cast("double").as("__y"))
    val feats0 = if (callerCached) feats0sel
      else feats0sel.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey, "true")
    try {
      // size the training cache's partitions to the data: the nnz count
      // comes off the transient feats cache (which also pre-warms the
      // featurization for the two unions below)
      // ≈32k rows per partition, capped at the session parallelism:
      // the cap is what scales (any real corpus saturates it); the
      // divisor only dials small inputs, where the measured optimum
      // balances per-task scheduling (~5 ms each, ×iters) against the
      // single-thread decimal fold (32k rows ≈ 25 ms)
      val nnz = feats0.count()
      val parts = math.max(1L, math.min(
        spark.sparkContext.defaultParallelism.toLong,
        (nnz + 32767L) / 32768L)).toInt
      val biasRows = feats0.groupBy("__id").agg(first(col("__y")).as("__y"))
        .select(col("__id"), lit(0).as("__pos"), lit(1.0).as("__x"),
          col("__y"))
      val sentinels = (0 to dim).map(j => (Option.empty[Long], j))
        .toDF("__id", "__pos")
        .select(col("__id"), col("__pos"),
          lit(null).cast("double").as("__x"),
          lit(null).cast("double").as("__y"))
      // sortWithinPartitions: the cached plan's outputOrdering on __id
      // satisfies every iteration's window sort requirement, so the
      // per-doc window pays its sort ONCE at cache fill instead of
      // once per iteration
      val pairs = feats0.unionByName(biasRows).unionByName(sentinels)
        .repartition(parts, col("__id"))
        .sortWithinPartitions("__id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // one row per real doc by construction (sentinels carry a null
        // id) — doubles as the cache warm-up
        val n = pairs
          .where(col("__pos") === 0 && col("__id").isNotNull)
          .count().toDouble
        spark.conf.set(aqeKey, "false")
        val wd = org.apache.spark.sql.expressions.Window.partitionBy("__id")
        var w = Array.fill(dim + 1)(0.0) // index 0 = bias
        for (_ <- 1 to iters) {
          val wRel = broadcast((0 to dim).map(j => (j, w(j)))
            .toDF("__wpos", "__wj"))
          val zsum = sum(when(col("__pos") > 0,
            (col("__x") * col("__wj")).cast(dec))).over(wd).cast("double")
          val bias = max(when(col("__pos") === 0, col("__wj"))).over(wd)
          val d = lit(1.0) / (lit(1.0) + exp(-(zsum + bias))) - col("__y")
          val updated = pairs
            .join(wRel, col("__pos") === col("__wpos"))
            .select(col("__pos"), col("__wj"), col("__x"), d.as("__d"))
            .groupBy("__pos")
            .agg(max(col("__wj")).as("__wc"),
              sum((col("__d") * col("__x")).cast(dec)).cast("double")
                .as("__g"))
            .select(col("__pos"),
              (floor((col("__wc") -
                lit(lr) * coalesce(col("__g"), lit(0.0)) / lit(n)) *
                lit(1e9)).cast("double") / lit(1e9)).as("__w"))
            .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
          w = Array.tabulate(dim + 1)(updated)
        }
        (0 to dim).map(j => (j, w(j))).toDF("pos", "weight")
      } finally pairs.unpersist(blocking = false)
    } finally {
      spark.conf.set(aqeKey, aqeWas)
      if (!callerCached) feats0.unpersist(blocking = false)
    }
  }

  /** Confusion readout for the sparse form: score each doc under the
    * [[logisticFitSparse]] weight relation (collected to a literal map
    * — bounded at dim+1 by contract) with one doc-key aggregate, then
    * one count aggregate. Output: (label, pred, n). */
  def logisticConfusionSparse(pairs: DataFrame, idCol: String,
                              posCol: String, xCol: String, yCol: String,
                              weights: DataFrame): DataFrame = {
    val wRows = weights.collect().map(r => r.getInt(0) -> r.getDouble(1))
    val b = wRows.toMap.getOrElse(0, 0.0)
    val wMap = typedlit(wRows.filter(_._1 > 0).toMap)
    pairs
      .select(col(idCol).as("__id"),
        (col(xCol).cast("double") *
          element_at(wMap, col(posCol).cast("int"))).cast(dec).as("__t"),
        col(yCol).cast("double").as("__y"))
      .groupBy("__id")
      .agg(((sum(col("__t")).cast("double") + lit(b)) > 0.0).cast("int")
        .as("pred"), first(col("__y")).cast("long").as("label"))
      .groupBy("label", "pred").agg(count(lit(1)).as("n"))
  }

  /** The [[logisticFit]] training trajectory as a DuckDB `WITH` chain
    * over an `embeddings(vec_id, embedding, label)`-shaped relation
    * with `yExpr` the 0/1 label expression (cast it to DOUBLE): the
    * same iterations unrolled as chained CTEs on the exploded
    * (row, pos) relation — per-term DECIMAL(38,18) casts make the two
    * formulations provably equal. Ends with CTEs `w<iters>` (pos, w)
    * and `b<iters>` (b); chain a final SELECT after it. */
  def logisticCtesSql(relation: String, yExpr: String, dim: Int,
                      iters: Int, lr: Double): String =
    logisticCtesFromSql(
      s"""e AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS x, $yExpr AS y
         |  FROM $relation)""".stripMargin,
      s"n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM $relation)",
      dim, iters, lr)

  /** [[logisticCtesSql]] generalized to ANY feature relation: the
    * caller supplies the `e AS (...)` CTE (vec_id, pos ∈ 1..dim, x, y;
    * sparse is fine — absent terms add exact zero under the DECIMAL
    * sums) and the `n AS (...)` one-row row-count CTE. How the
    * hashed-TF text featurization plugs the same training chain. */
  def logisticCtesFromSql(eCte: String, nCte: String, dim: Int,
                          iters: Int, lr: Double): String = {
    val head =
      s"""WITH $eCte,
         |$nCte,
         |w0 AS (SELECT i AS pos, 0.0 AS w FROM generate_series(1, $dim) t(i)),
         |b0 AS (SELECT 0.0 AS b)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""z$k AS MATERIALIZED (SELECT e.vec_id, any_value(e.y) AS y,
         |    1.0 / (1.0 + exp(-(CAST(sum(CAST(e.x * p.w AS DECIMAL(38,18)))
         |      AS DOUBLE) + any_value(b.b)))) AS s
         |  FROM e JOIN w${k - 1} p ON e.pos = p.pos, b${k - 1} b
         |  GROUP BY e.vec_id),
         |g$k AS (SELECT e.pos,
         |    CAST(sum(CAST((z.s - z.y) * e.x AS DECIMAL(38,18))) AS DOUBLE) AS g
         |  FROM e JOIN z$k z ON e.vec_id = z.vec_id GROUP BY e.pos),
         |gb$k AS (SELECT CAST(sum(CAST(s - y AS DECIMAL(38,18))) AS DOUBLE) AS gb
         |  FROM z$k),
         |w$k AS MATERIALIZED (SELECT pos,
         |    floor((p.w - $lr * COALESCE(g.g, 0.0) / n.n) * 1e9) / 1e9 AS w
         |  FROM w${k - 1} p LEFT JOIN g$k g USING (pos), n),
         |b$k AS MATERIALIZED (SELECT floor((b.b - $lr * gb.gb / n.n) * 1e9) / 1e9 AS b
         |  FROM b${k - 1} b, gb$k gb, n)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** [[logisticFit]]'s output as DuckDB SQL (full statement). */
  def logisticFitOracleSql(relation: String, yExpr: String, dim: Int,
                           iters: Int, lr: Double): String =
    logisticCtesSql(relation, yExpr, dim, iters, lr) +
      s"""\nSELECT pos, w AS weight FROM w$iters
         |UNION ALL SELECT 0 AS pos, b AS weight FROM b$iters""".stripMargin

  /** [[logisticConfusion]] on the final fitted model as DuckDB SQL —
    * chains [[logisticCtesSql]] then the scoring select; full
    * statement emitting (label, pred, n). */
  def logisticConfusionOracleSql(relation: String, yExpr: String,
                                 dim: Int, iters: Int,
                                 lr: Double): String =
    logisticCtesSql(relation, yExpr, dim, iters, lr) + "\n" +
      confusionSelectSql(iters)

  /** [[logisticConfusionOracleSql]] over a caller-supplied feature
    * relation (see [[logisticCtesFromSql]]). */
  def logisticConfusionFromSql(eCte: String, nCte: String, dim: Int,
                               iters: Int, lr: Double): String =
    logisticCtesFromSql(eCte, nCte, dim, iters, lr) + "\n" +
      confusionSelectSql(iters)

  private def confusionSelectSql(iters: Int): String =
    s"""SELECT CAST(y AS BIGINT) AS label,
       |  CAST(CASE WHEN zz > 0.0 THEN 1 ELSE 0 END AS INT) AS pred,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT e.vec_id, any_value(e.y) AS y,
       |    CAST(sum(CAST(e.x * p.w AS DECIMAL(38,18))) AS DOUBLE)
       |      + any_value(b.b) AS zz
       |  FROM e JOIN w$iters p ON e.pos = p.pos, b$iters b
       |  GROUP BY e.vec_id)
       |GROUP BY 1, 2""".stripMargin
}
