package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine decision-tree training by LEVEL-WISE histogram split
  * finding — the XGBoost/LightGBM distributed pattern: per tree level,
  * ONE corpus aggregate builds the (node, feature, bin) class-count
  * histogram, a MODEL-SIZED relation (≤ nodes·F·B rows, independent of
  * corpus size) hops to the driver, and split selection is pure
  * integer-count arithmetic there. Training cost is honestly
  * depth × (one scan + one bounded-explode aggregate) — never one pass
  * per NODE, and nothing corpus-sized ever leaves the executors. The
  * natural in-engine quality-filter trainer next to
  * [[LinearModel.logisticFit]] when the decision surface is
  * axis-aligned (length/ratio/score features) rather than linear.
  *
  * Determinism contract: histograms are exact integer counts, so the
  * only floats are the per-candidate impurity scores. Both engines
  * compute the identical IEEE sequence
  * `np·(n−np)/n` (products of exact-integer doubles < 2⁵³ — one
  * rounding at the division) and rank by the 1e-9-floor-quantized gain
  * with an (feature, bin) ascending tie-break, so the fitted tree is
  * bit-replayable by the DuckDB oracle and invariant to partitioning.
  *
  * Fixed equal-width binning (lo, hi, bins) keeps the bin id a pure
  * per-row expression — no quantile pre-pass, no global sort; choose
  * `(hi−lo)/bins` binary-representable (e.g. 1/16) so bin edges and
  * thresholds are exact in both engines.
  */
object TreeModel {

  /** One fitted node: internal (feature/bin/gain set) or leaf. */
  private case class Node(id: Int, depth: Int, n: Long, nPos: Long,
                          feature: Option[Int], bin: Option[Int],
                          gainQ9: Option[Long])

  /** Bin id of `x`: clamp(floor((x − lo)/w), 0, bins−1) — identical
    * IEEE ops on both engines. */
  private def binOf(x: Column, lo: Double, w: Double, bins: Int): Column =
    least(lit(bins - 1),
      greatest(lit(0), floor((x - lit(lo)) / lit(w)).cast("int")))

  /** Weighted half-gini mass np·(n−np)/n as the exact IEEE sequence
    * shared with the oracle (two exact-int double products, one
    * division). Callers guarantee n > 0. */
  private def giniMass(n: Long, np: Long): Double =
    np.toDouble * (n - np).toDouble / n.toDouble

  /** Fit a depth-`depth` binary classification tree on the first
    * `nFeatures` coordinates of `vecCol` (array of float/double)
    * against `labelCol` ∈ {0,1}, with `bins` equal-width bins over
    * [lo, hi). A node splits on the (feature, bin) candidate of
    * maximal 1e-9-quantized gini gain (tie-break: feature asc, bin
    * asc) when gain > 0 and both children hold ≥ `minLeaf` rows; rows
    * with bin(x_f) ≤ b go LEFT (child 2·node), else RIGHT (2·node+1).
    *
    * Returns the tree relation, one row per node:
    * (node_id, depth, n, n_pos, feature, bin, threshold, gain_q9) —
    * feature/bin/threshold/gain_q9 NULL on leaves; threshold is the
    * split bin's right edge lo + w·(bin+1). Root is node 1.
    *
    * Scale shape: `depth` passes total; pass k scans the corpus once,
    * explodes to nFeatures rows per record (bounded), and hash-
    * aggregates to ≤ 2^k·nFeatures·bins count rows. Child leaf stats
    * fall out of the split candidates' cumulative counts — no extra
    * pass. At 100 TB: identical plan, histogram stays model-sized. */
  def treeFit(points: DataFrame, vecCol: String, labelCol: String,
              nFeatures: Int, bins: Int, lo: Double, hi: Double,
              depth: Int, minLeaf: Long = 1L): DataFrame = {
    require(depth >= 1 && depth <= 6, s"depth must be in [1,6], got $depth")
    require(bins >= 2 && bins <= 4096, s"bins must be in [2,4096], got $bins")
    require(nFeatures >= 1, s"nFeatures must be >= 1, got $nFeatures")
    val w = (hi - lo) / bins
    val spark = points.sparkSession
    import spark.implicits._

    val base = points.select(col(vecCol).as("__v"),
      col(labelCol).cast("long").as("__y"))

    // node → (feature, bin) of the committed splits, driving both the
    // per-level assignment expression and the final tree relation
    var splits = Map.empty[Int, (Int, Int)]
    var nodes = Vector.empty[Node]
    // split children awaiting the next level: id → (depth, n, np)
    var pending = Map.empty[Int, (Int, Long, Long)]

    def nodeExpr: Column =
      splits.toSeq.sortBy(_._1).foldLeft(lit(1)) { case (acc, (m, (f, b))) =>
        when(acc === m,
          lit(2 * m) + (binOf(element_at(col("__v"), f).cast("double"),
            lo, w, bins) > b).cast("int")).otherwise(acc)
      }

    for (level <- 0 until depth) {
      // histogram pass: ONE aggregate, ≤ 2^level·F·B rows to the driver
      val hist = base
        .select(nodeExpr.as("__node"),
          posexplode(slice(col("__v"), 1, nFeatures)).as(Seq("__f0", "__x")),
          col("__y"))
        .select(col("__node"), (col("__f0") + 1).as("__f"),
          binOf(col("__x").cast("double"), lo, w, bins).as("__b"),
          col("__y"))
        .groupBy("__node", "__f", "__b")
        .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
          (r.getLong(3), r.getLong(4)))
        .toMap
      // nodes splittable at this level: the root, or children minted by
      // the previous level's splits (stale leaf ids still flow through
      // the histogram under their own id — ignored here, exactly as the
      // oracle's inner-join assignment drops them)
      val liveNodes = hist.keys.map(_._1).filter { m =>
        (level == 0 && m == 1) || (m >= (1 << level) && m < (2 << level))
      }.toSet.toSeq.sorted
      for (m <- liveNodes) {
        // densified per-feature cumulative counts (absent bins are 0)
        val nTot = (0 until bins).map(b => hist.getOrElse((m, 1, b), (0L, 0L))._1).sum
        val npTot = (0 until bins).map(b => hist.getOrElse((m, 1, b), (0L, 0L))._2).sum
        // scanning f asc, b asc and requiring STRICT improvement keeps
        // the first candidate on qgain ties — the oracle's
        // (qgain DESC, f, b) row_number ranking
        var best: Option[(Long, Int, Int, Long, Long)] = None // (qgain,f,b,nl,npl)
        val gp = giniMass(nTot, npTot)
        for (f <- 1 to nFeatures) {
          var nl = 0L; var npl = 0L
          for (b <- 0 until bins - 1) {
            val (hn, hnp) = hist.getOrElse((m, f, b), (0L, 0L))
            nl += hn; npl += hnp
            val nr = nTot - nl; val npr = npTot - npl
            if (nl >= minLeaf && nr >= minLeaf) {
              val gain = (gp - giniMass(nl, npl)) - giniMass(nr, npr)
              val qgain = math.floor(gain * 1e9).toLong
              if (qgain > 0 && best.forall(qgain > _._1))
                best = Some((qgain, f, b, nl, npl))
            }
          }
        }
        best match {
          case Some((qg, f, b, nl, npl)) =>
            splits += m -> (f, b)
            nodes :+= Node(m, level, nTot, npTot, Some(f), Some(b), Some(qg))
            pending -= m
            pending += (2 * m) -> (level + 1, nl, npl)
            pending += (2 * m + 1) -> (level + 1, nTot - nl, npTot - npl)
          case None =>
            nodes :+= Node(m, level, nTot, npTot, None, None, None)
            pending -= m
        }
      }
    }
    // split children the depth limit cut off — terminal leaves
    for ((id, (d, n, np)) <- pending)
      nodes :+= Node(id, d, n, np, None, None, None)

    nodes.sortBy(_.id)
      .map(nd => (nd.id, nd.depth, nd.n, nd.nPos, nd.feature, nd.bin,
        nd.feature.map(_ => lo + w * (nd.bin.get + 1)), nd.gainQ9))
      .toDF("node_id", "depth", "n", "n_pos", "feature", "bin",
        "threshold", "gain_q9")
  }

  /** Score `points` under a fitted tree relation: walk the broadcast
    * splits to a leaf, predict the leaf's majority class (n_pos·2 > n —
    * integer compare, no float), fold to a (label, pred, n) confusion.
    * ONE map-only walk (the tree is a CASE chain) + one count
    * aggregate. */
  def treeConfusion(points: DataFrame, vecCol: String, labelCol: String,
                    tree: DataFrame, nFeatures: Int, bins: Int,
                    lo: Double, hi: Double): DataFrame = {
    val w = (hi - lo) / bins
    val rows = tree.collect()
    val splits = rows.filter(!_.isNullAt(4))
      .map(r => r.getInt(0) -> (r.getInt(4), r.getInt(5))).toMap
    val leafPred = rows.filter(_.isNullAt(4))
      .map(r => r.getInt(0) -> (if (r.getLong(3) * 2 > r.getLong(2)) 1 else 0))
      .toMap
    // parents sort before children, so ONE ascending fold walks the
    // whole root→leaf path (each when() sees the already-stepped id)
    val node: Column = splits.toSeq.sortBy(_._1).foldLeft(lit(1)) {
      case (acc, (m, (f, b))) =>
        when(acc === m,
          lit(2 * m) + (binOf(element_at(col(vecCol), f).cast("double"),
            lo, w, bins) > b).cast("int")).otherwise(acc)
    }
    val pred = leafPred.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (acc, (m, p)) => when(node === m, lit(p)).otherwise(acc)
    }
    points
      .select(col(labelCol).cast("long").as("label"), pred.as("pred"))
      .groupBy("label", "pred").agg(count(lit(1)).as("n"))
  }

  /** [[treeFit]]'s trajectory as chained DuckDB CTEs over a caller-
    * supplied points CTE `pts(rid, v, y)` with `v` a DOUBLE[] of at
    * least `nFeatures` coordinates and `y` ∈ {0,1} — per level: the
    * same histogram, a densified cumulative (absent bins COALESCE to
    * 0), the same IEEE gain sequence, the same floor-1e9 ranking and
    * (f, b) tie-break. Emits the final `nodes` CTE
    * (node_id, depth, n, n_pos, feature, bin, threshold, gain_q9);
    * chain a SELECT after it. */
  def treeCtesSql(ptsCte: String, nFeatures: Int, bins: Int, lo: Double,
                  hi: Double, depth: Int, minLeaf: Long = 1L): String = {
    val w = (hi - lo) / bins
    val head =
      s"""WITH $ptsCte,
         |a0 AS (SELECT rid, v, y, 1 AS node FROM pts)""".stripMargin
    val levels = (0 until depth).map { k =>
      s"""h$k AS (SELECT node, f.f AS f,
         |    LEAST(${bins - 1}, GREATEST(0,
         |      CAST(floor((v[f.f] - ($lo)) / $w) AS INT))) AS b,
         |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
         |  FROM a$k, generate_series(1, $nFeatures) f(f)
         |  GROUP BY 1, 2, 3),
         |d$k AS (SELECT nd.node, f.f, b.b,
         |    COALESCE(h.n, 0) AS n, COALESCE(h.np, 0) AS np
         |  FROM (SELECT DISTINCT node FROM a$k) nd
         |  CROSS JOIN generate_series(1, $nFeatures) f(f)
         |  CROSS JOIN generate_series(0, ${bins - 1}) b(b)
         |  LEFT JOIN h$k h ON h.node = nd.node AND h.f = f.f AND h.b = b.b),
         |c$k AS (SELECT node, f, b,
         |    sum(n) OVER (PARTITION BY node, f ORDER BY b) AS nl,
         |    sum(np) OVER (PARTITION BY node, f ORDER BY b) AS npl,
         |    sum(n) OVER (PARTITION BY node, f) AS nt,
         |    sum(np) OVER (PARTITION BY node, f) AS npt
         |  FROM d$k),
         |g$k AS (SELECT node, f, b, nl, npl, nt, npt,
         |    CAST(floor(((CAST(npt AS DOUBLE) * CAST(nt - npt AS DOUBLE)
         |          / CAST(nt AS DOUBLE)
         |        - CAST(npl AS DOUBLE) * CAST(nl - npl AS DOUBLE)
         |          / CAST(nl AS DOUBLE))
         |        - CAST(npt - npl AS DOUBLE) * CAST((nt - nl) - (npt - npl)
         |            AS DOUBLE) / CAST(nt - nl AS DOUBLE)) * 1e9)
         |      AS BIGINT) AS qgain
         |  FROM c$k
         |  WHERE b < ${bins - 1} AND nl >= $minLeaf
         |    AND nt - nl >= $minLeaf),
         |s$k AS (SELECT * FROM g$k WHERE qgain > 0
         |  QUALIFY row_number() OVER (PARTITION BY node
         |    ORDER BY qgain DESC, f, b) = 1),
         |a${k + 1} AS (SELECT a.rid, a.v, a.y,
         |    2 * a.node + CASE WHEN LEAST(${bins - 1}, GREATEST(0,
         |        CAST(floor((a.v[s.f] - ($lo)) / $w) AS INT))) > s.b
         |      THEN 1 ELSE 0 END AS node
         |  FROM a$k a JOIN s$k s ON a.node = s.node)""".stripMargin
    }
    // internal rows from s_k; leaf rows = split children absent from the
    // next level's split set, plus level-k nodes that never split
    val internal = (0 until depth).map { k =>
      s"""  SELECT CAST(node AS INT) AS node_id, $k AS depth,
         |    CAST(nt AS BIGINT) AS n, CAST(npt AS BIGINT) AS n_pos,
         |    CAST(f AS INT) AS feature, CAST(b AS INT) AS bin,
         |    ($lo) + $w * (b + 1) AS threshold, qgain AS gain_q9
         |  FROM s$k""".stripMargin
    }
    val childLeaves = (0 until depth).map { k =>
      val nextFilter =
        if (k + 1 < depth) s"WHERE ch.node_id NOT IN (SELECT node FROM s${k + 1})"
        else ""
      s"""  SELECT CAST(ch.node_id AS INT) AS node_id, ${k + 1} AS depth,
         |    CAST(ch.n AS BIGINT) AS n, CAST(ch.n_pos AS BIGINT) AS n_pos,
         |    CAST(NULL AS INT) AS feature, CAST(NULL AS INT) AS bin,
         |    CAST(NULL AS DOUBLE) AS threshold,
         |    CAST(NULL AS BIGINT) AS gain_q9
         |  FROM (SELECT 2 * node AS node_id, nl AS n, npl AS n_pos FROM s$k
         |        UNION ALL
         |        SELECT 2 * node + 1, nt - nl, npt - npl FROM s$k) ch
         |  $nextFilter""".stripMargin
    }
    // at k>0, nodes in a_k without a split row are exactly the level-
    // (k-1) split children that childLeaves already emits via its
    // NOT IN s_k filter — only the never-split ROOT needs its own term
    val rootUnsplit =
      s"""  SELECT CAST(node AS INT) AS node_id, 0 AS depth,
         |    CAST(nt AS BIGINT) AS n, CAST(npt AS BIGINT) AS n_pos,
         |    CAST(NULL AS INT) AS feature, CAST(NULL AS INT) AS bin,
         |    CAST(NULL AS DOUBLE) AS threshold,
         |    CAST(NULL AS BIGINT) AS gain_q9
         |  FROM (SELECT DISTINCT node, nt, npt FROM c0 WHERE f = 1)
         |  WHERE node NOT IN (SELECT node FROM s0)""".stripMargin
    val nodesCte =
      s"""nodes AS (
         |${(internal ++ childLeaves :+ rootUnsplit).mkString("\nUNION ALL\n")}
         |)""".stripMargin
    (head +: levels :+ nodesCte).mkString(",\n")
  }

  /** [[treeConfusion]] as the SQL suffix after [[treeCtesSql]]: each
    * row's terminal node is its a_depth assignment, or its a_k node for
    * the level k where the walk stopped (node without a split row);
    * prediction is the leaf's integer-exact majority 2·n_pos > n. Full
    * statement emitting (label, pred, n). */
  def treeConfusionSql(ptsCte: String, nFeatures: Int, bins: Int,
                       lo: Double, hi: Double, depth: Int,
                       minLeaf: Long = 1L): String = {
    val stopped = (0 until depth).map { k =>
      s"""  SELECT rid, y, node FROM a$k
         |  WHERE node NOT IN (SELECT node FROM s$k)""".stripMargin
    }
    treeCtesSql(ptsCte, nFeatures, bins, lo, hi, depth, minLeaf) +
      s""",
         |assigned AS (
         |  SELECT rid, y, node FROM a$depth
         |UNION ALL
         |${stopped.mkString("\nUNION ALL\n")}
         |)
         |SELECT CAST(a.y AS BIGINT) AS label, l.pred,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM assigned a
         |JOIN (SELECT node_id,
         |        CAST(CASE WHEN 2 * n_pos > n THEN 1 ELSE 0 END AS INT)
         |          AS pred
         |      FROM nodes WHERE feature IS NULL) l
         |  ON a.node = l.node_id
         |GROUP BY 1, 2""".stripMargin
  }
}
