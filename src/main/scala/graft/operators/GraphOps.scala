package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation.
  *
  * Web-scale training-data pipelines weight and filter documents by the
  * standing of their source: a domain's rank in the crawl link graph is
  * one of the strongest cheap quality priors (the CommonCrawl-derived
  * corpora all ship host/domain rank tables). This module computes
  * PageRank over an aggregated (src, dst, weight) edge relation with the
  * join-per-iteration shape that scales to billion-node graphs — no
  * driver-resident adjacency, no GraphX dependency, every round is one
  * hash shuffle keyed on node id.
  *
  * Arithmetic is INTEGER nano-units end to end (rank 1.0 = 1e9), the same
  * order-exactness trick as the unigram-LM scorer: per-edge contributions
  * are `(r·w) DIV W` on longs and the damping step is
  * `(1−d)·SCALE + (d_num·inflow) DIV d_den`, so every value is a fixed
  * integer expression tree — bit-identical across engines, partitionings
  * and summation orders, which is what lets a DuckDB oracle replay the
  * iterations exactly. The trade is a deterministic floor at each
  * division (≤1 nano-unit per edge per round) — noise four orders of
  * magnitude below any ranking decision.
  */
object GraphOps {

  /** Nano-unit scale: rank 1.0 ≡ 1e9. */
  val Scale: Long = 1000000000L

  /** Weighted PageRank in exact integer nano-units.
    *
    * Semantics (per iteration, all integer ops):
    * {{{
    *   inflow(v) = Σ over in-edges (s,v,w):  (r(s) * w) DIV W(s)
    *   r'(v)     = (den−num)·Scale DIV den + (num · inflow(v)) DIV den
    * }}}
    * where `W(s)` is s's total out-weight and `num/den` is the damping
    * factor (default 85/100). Nodes = union of edge endpoints, seeded at
    * `Scale` (rank 1.0). Dangling nodes (no out-edges) keep receiving the
    * teleport term but their mass is NOT redistributed — the standard
    * "leaky" variant; document sets with meaningful dangling mass should
    * add explicit sink edges. Self-loops are dropped (they only slow
    * convergence). Overflow bound: `max_rank · max_edge_weight < 2^63`
    * (≈9.2e18) — with ranks bounded by `n_nodes·Scale` this holds up to
    * ~1e9 weighted edges into a single host; cap per-edge weights (e.g.
    * at 1e6) before calling if the crawl can exceed it.
    *
    * Scale shape: the edge relation aggregates once (one shuffle on
    * (src,dst)), out-weights once more (on src), and each iteration is
    * ONE join of the |nodes|-row rank relation to the edge list (hash
    * shuffle on src — or broadcast when ranks fit) plus a groupBy(dst).
    * Iteration state materializes to scratch parquet exactly like
    * [[Dedup.duplicateClusters]] — lineage stays one-round deep, no
    * block-manager residue, at most two snapshots live at once, and the
    * same non-local-master guard applies (driver-local scratch would
    * silently shear state across executors).
    *
    * `seeds` (one column, node ids) switches to TRUSTRANK (Gyöngyi,
    * Garcia-Molina, Pedersen, VLDB'04): teleport mass lands only on the
    * seed whitelist, so rank becomes trust flowing out of the seeds
    * along links — the "which domains does the trusted core endorse"
    * prior a crawl pipeline combines with raw PageRank. Nodes the seeds
    * cannot reach decay to EXACTLY 0 (integer arithmetic, no epsilon
    * tail); seeds absent from the graph are ignored.
    *
    * @return (node, rank_nano: Long) — rank 1.0 ≡ [[Scale]].
    */
  def pageRankNano(edges: DataFrame, srcCol: String, dstCol: String,
                   weightCol: Column, iters: Int,
                   dampNum: Long = 85L, dampDen: Long = 100L,
                   scratchDir: Option[String] = None,
                   seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      s"damping $dampNum/$dampDen must be a fraction in [0, 1]")
    val spark = edges.sparkSession
    Dedup.requireClusterSafeScratch(spark.sparkContext.isLocal, scratchDir)
    val tmp = scratchDir.getOrElse(
      org.apache.spark.sql.GraftSqlBridge.managedTempDir("graft-pr").getAbsolutePath)
    val hadoopConf = spark.sessionState.newHadoopConf()
    def materialize(df: DataFrame, name: String): DataFrame = {
      val p = tmp + "/" + name
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    def drop(name: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(tmp + "/" + name)
      p.getFileSystem(hadoopConf).delete(p, true)
    }

    // one pass: collapse parallel edges, drop self-loops, attach total
    // out-weight — the loop input, so it is materialized once instead of
    // re-deriving two aggregates from the source every round
    val agg = edges
      .where(col(srcCol) =!= col(dstCol))
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(weightCol).cast("long").as("w"))
    val ew = materialize(
      agg.join(agg.groupBy("src").agg(sum("w").as("ow")), "src"), "edges")
    val nodes = materialize(
      ew.select(col("src").as("node"))
        .union(ew.select(col("dst").as("node"))).distinct(), "nodes")

    val teleport = (dampDen - dampNum) * Scale / dampDen // exact when den | Scale
    // TrustRank mode (Gyöngyi, Garcia-Molina, Pedersen, VLDB'04): with a
    // seed set, the teleport mass lands ONLY on seeds — rank becomes
    // trust that flows out of the seed whitelist along links, and an
    // unreachable node's rank decays to exactly 0 (integer arithmetic,
    // no epsilon tail). Seeds not present in the graph are ignored (they
    // have no edges to flow through). The node spine gains one
    // vocabulary-sized left join; everything else is unchanged.
    val spine = seeds match {
      case Some(s0) =>
        val s = s0.select(col(s0.columns.head).as("node"), lit(1).as("__seed"))
          .distinct()
        materialize(nodes.join(s, Seq("node"), "left")
          .select(col("node"),
            when(col("__seed").isNotNull, lit(teleport)).otherwise(lit(0L))
              .as("tele")), "spine")
      case None => nodes.select(col("node"), lit(teleport).as("tele"))
    }
    // seed rank = the node's teleport-only fixed point at iteration 0:
    // Scale for uniform PageRank, Scale·[seed] for TrustRank
    var ranks = seeds match {
      case Some(_) => spine.select(col("node"),
        when(col("tele") > 0, lit(Scale)).otherwise(lit(0L)).as("r"))
      case None => nodes.select(col("node"), lit(Scale).as("r"))
    }
    var i = 0
    while (i < iters) {
      val inflow = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r * w DIV ow").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      val next = spine
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (col("tele") +
            expr(s"$dampNum * coalesce(inflow, 0L) DIV $dampDen")).as("r"))
      val m = materialize(next, s"iter$i")
      if (i > 0) drop(s"iter${i - 1}")
      ranks = m
      i += 1
    }
    ranks.select(col("node"), col("r").as("rank_nano"))
  }

  /** DuckDB oracle twin of [[pageRankNano]]: the iterations unrolled as
    * CTEs over an edge CTE named `e` with columns (src, dst, w) — self-
    * loops must already be dropped and parallel edges collapsed by the
    * caller's `e`. Integer `//` floor-division matches Spark's `DIV` on
    * the non-negative values here. Emits the WITH-clause bodies from
    * `ew`/`n`/`r0` through `r{iters}`; the caller selects from
    * `r{iters}`. */
  def pageRankNanoOracleCtes(iters: Int, dampNum: Long = 85L,
                             dampDen: Long = 100L,
                             seeded: Boolean = false): String = {
    val teleport = (dampDen - dampNum) * Scale / dampDen
    val spine =
      if (seeded)
        s"""spine AS (SELECT n.node,
           |    CASE WHEN s.node IS NOT NULL THEN CAST($teleport AS BIGINT)
           |      ELSE CAST(0 AS BIGINT) END AS tele
           |  FROM n LEFT JOIN (SELECT DISTINCT node FROM seeds) s
           |  ON n.node = s.node),
           |r0 AS (SELECT node,
           |    CASE WHEN tele > 0 THEN CAST($Scale AS BIGINT)
           |      ELSE CAST(0 AS BIGINT) END AS r FROM spine)""".stripMargin
      else
        s"""spine AS (SELECT node, CAST($teleport AS BIGINT) AS tele FROM n),
           |r0 AS (SELECT node, CAST($Scale AS BIGINT) AS r FROM n)""".stripMargin
    val head =
      s"""ew AS (SELECT e.src, e.dst, e.w, ow.ow FROM e
         |  JOIN (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src) ow
         |  USING (src)),
         |n AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |$spine""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""i$i AS (SELECT dst, CAST(sum((r * w) // ow) AS BIGINT) AS f
         |  FROM ew JOIN r${i - 1} ON ew.src = r${i - 1}.node GROUP BY dst),
         |r$i AS (SELECT spine.node,
         |    CAST(spine.tele + ($dampNum * COALESCE(f, 0)) // $dampDen AS BIGINT) AS r
         |  FROM spine LEFT JOIN i$i ON spine.node = i$i.dst)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** In/out degree + weight profile per node — the companion sanity
    * relation (hub/authority skew, dangling share) a rank table ships
    * with. One shuffle per direction on node id. */
  def degreeStats(edges: DataFrame, srcCol: String, dstCol: String,
                  weightCol: Column): DataFrame = {
    val out = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("out_deg"), sum(weightCol).cast("long").as("out_w"))
    val in = edges.groupBy(col(dstCol).as("node"))
      .agg(count(lit(1)).as("in_deg"), sum(weightCol).cast("long").as("in_w"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("out_w"), lit(0L)).as("out_w"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("in_w"), lit(0L)).as("in_w"))
  }
}
