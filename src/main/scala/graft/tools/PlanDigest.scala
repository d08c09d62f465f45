package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-snapshot regression gate (round-6 advice item 7): structural
  * digests — exchange counts, join strategies, aggregate/generate/window
  * node counts, pushed-filter scan count — of the most expensive
  * queries' physical plans, committed to `tools/plan_digests.txt` and
  * diffed by PlanSnapshotSpec on every test run. "The plan you'd want
  * at 100×" stops being a per-round judge audit and becomes a tripwire:
  * an accidental extra shuffle, a broadcast that silently degrades to
  * sort-merge, or a lost parquet pushdown fails the suite with a diff.
  *
  * Regenerate INTENTIONALLY after a deliberate plan change:
  * `sbt "runMain graft.tools.PlanDigest"` (writes the committed file),
  * then review the diff in git like any other code change.
  *
  * Digests are taken on the NON-adaptive plan (AQE re-plans at runtime
  * from stats; the pre-execution plan is the deterministic artifact) at
  * sf0.001, where planning is sub-second per query. Node names are
  * class simple names, so the digest is insensitive to formatting and
  * expression ids but sensitive to every structural change that matters
  * at scale. */
object PlanDigest {

  /** The tracked queries: the most expensive batch queries per
    * BASELINE.md's recorded sweeps (streaming queries excluded — their
    * micro-batch plans are not exposed as one static executedPlan). */
  val Tracked: Seq[String] = Seq(
    "q_melt", "q_minhash_pairs", "q_near_dup", "q_jaccard_pairs",
    "q_cube", "q_emb_dedup", "q_ann_topk", "q_semantic_dedup",
    "q_tfidf", "q_scd2",
    // round-7 additions: the top of the current bench_last.json ordering
    // (q_transform's window→broadcast-join-back reshape is pinned here)
    "q_transform", "q_url_norm", "q_bpe_encode", "q_winsorize",
    // round-7 session-2: the new declarative families (graph queries are
    // excluded — pageRankNano materializes per-iteration state, so its
    // final plan is just the last scratch scan)
    "q_bigram_lm", "q_cm_freq",
    // round-7 session-3: triangles is the one superlinear-by-design
    // plan (wedge join must stay single-consumer — the 3× corner-union
    // regression this gate now prevents); pmi/psi/paths3 pin the
    // count-aggregate shapes (iterative kcore excluded like the rest)
    "q_triangles", "q_pmi", "q_psi", "q_paths3",
    // session-3b: the rest of the current bench top set + the capped
    // co-visitation self-join and the seasonal broadcast join-back
    "q_temperature_mix", "q_text_stats", "q_strip_markup", "q_covisit",
    "q_seasonal", "q_ks",
    // validate's contract IS its plan shape: all scalar rules in ONE
    // scan (an accidental per-rule rescan would multiply corpus cost)
    "q_validate",
    // session-4: the new declarative families. asof_nearest's contract
    // is ONE WindowExec (backward+forward as two frames of one node);
    // resample/calibration pin the single-aggregate shapes; outliers
    // pins its 3-scan + broadcast-join-back; fuzzy_linkage pins the
    // bounded-block single-exchange pair machinery
    "q_fuzzy_linkage", "q_attribution", "q_survival", "q_outliers",
    "q_fd", "q_calibration", "q_interarrival", "q_transition_entropy",
    "q_asof_nearest", "q_resample",
    // interval_join's contract IS its plan: bucketized equi-join with
    // NO distinct/dedup exchange (the overlap-start rule replaces it)
    "q_interval_join",
    // session-5: cusum's contract is ONE exchange + ONE sort feeding two
    // stacked Window passes (the reflection identity's whole point);
    // rolling_corr pins the six-moments-in-one-Window fusion (+ the lag
    // pass on the same sort); cdc pins the single struct-max aggregate;
    // gains pins one percentile aggregate + broadcast band assignment;
    // pii pins the map-only zero-exchange scan
    "q_cusum", "q_rolling_corr", "q_cdc", "q_gains", "q_pii",
    // the flagship: quality gate fused into both scans, canonical-id
    // set broadcast LeftSemi (dedup aggregate exchange REUSED),
    // benchmark side broadcast, contaminated ids anti-joined — any
    // broadcast→SMJ flip or lost reuse here multiplies corpus scans
    "q_curation",
    // session-7: the two shapes the scale sweeps forced — margin_pairs
    // must broadcast ONLY the query batch (both top-k passes; a corpus
    // broadcast is the regression), kanon_suppress must stay a
    // class-agg + broadcast join-back (a quasi-key window would cap
    // parallelism at |classes|); target_encode pins the grouped-sums +
    // join-back (not a category window) for the same reason
    "q_margin_pairs", "q_kanon_suppress", "q_target_encode",
    // round-9: the remaining round-7-final shapes — incr_hist pins the
    // snapshot⊎delta FULL OUTER merge + model-sized window readout (a
    // corpus-sized re-aggregate is the regression); wilson pins ONE
    // grouped integer aggregate + closed-form CI; datasheet pins the
    // global-agg + fingerprint-grouped dup-mass pair (one scan each)
    "q_incr_hist", "q_wilson", "q_datasheet",
    // nb pins the scoring contract: the test-corpus token stream is
    // NEVER shuffled pre-aggregation — model relations broadcast
    // (labelStats cross + tokenCounts LeftOuter), one (doc,label)
    // partial-agg exchange, one doc-level argmax; a broadcast→SMJ flip
    // on the grid join would shuffle the whole crawl per label
    "q_nb",
    // chi2 pins presence-distinct → (token,label) count → token-key
    // join with BROADCAST label/N totals; silhouette pins the
    // broadcast-nested-loop centroid cross + the single point-key
    // aggregate (a flip to a shuffled join would exchange the corpus
    // once per centroid)
    "q_chi2_tokens", "q_silhouette",
    // logreg trains eagerly (round-9: one codegen-stable aggregate job
    // per iteration, model hops via driver), so its FINAL plan is just
    // the local weight relation — the pin now guards against training
    // work leaking back into the returned plan
    "q_logreg",
    // round-9 session-3: dbscan pins the epsilon-grid machinery — one
    // bounded x9 Generate, cell-keyed joins, count aggregates, and NO
    // CartesianProduct (the regression this pin exists to catch);
    // tree_acc pins the map-only CASE-chain walk + one count aggregate
    // (training is eager driver-hop jobs, like logreg)
    "q_dbscan", "q_tree_acc",
    // round-10: quantile_norm pins the one-corpus-scan contract — the
    // (group,bin)→pooled-bin map must BROADCAST back (a row shuffle or
    // SMJ flip re-exchanges the corpus); class_report pins the single
    // ROLLUP Expand aggregate (one scan for every slice + the total);
    // krippendorff pins the two model-sized aggregates + broadcast
    // scalar cross (no data×data join anywhere)
    "q_quantile_norm", "q_class_report", "q_krippendorff",
    // round-11 session-3: dp_release's contract is ONE hash aggregate +
    // map-only noise attach (the md5 fold must never grow an exchange
    // or a per-group join-back)
    "q_dp_release",
    // round-12/13: domain_stats2's contract is BROADCAST label-tail
    // joins (one per derived tail depth, all off ONE broadcast
    // exchange) + one final hash aggregate — a broadcast→SMJ flip on
    // the PSL rules table would shuffle the host stream once per tail
    "q_domain_stats2",
    // round-13: the container-probe contract is a map-only scan →
    // mapPartitions walk with ZERO exchanges before the final sort —
    // an accidental shuffle here would re-exchange every crawl
    // payload byte
    "q_video2")

  val SnapshotPath = "tools/plan_digests.txt"
  val DefaultSfDir = "/root/testdata/sf0.001"

  private val Interesting = Set(
    "FileSourceScanExec", "ShuffleExchangeExec", "BroadcastExchangeExec",
    "BroadcastHashJoinExec", "SortMergeJoinExec", "ShuffledHashJoinExec",
    "BroadcastNestedLoopJoinExec", "CartesianProductExec",
    "HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec",
    "GenerateExec", "ExpandExec", "WindowExec", "WindowGroupLimitExec",
    "SortExec")

  /** Structural digest of a DataFrame's physical plan: counts of the
    * scale-relevant node classes plus how many parquet scans carry
    * pushed filters. */
  def digest(df: DataFrame): Map[String, Int] = {
    val plan = df.queryExecution.executedPlan
    val counts = plan.collect { case p => p.getClass.getSimpleName }
      .filter(Interesting).groupBy(identity).view.mapValues(_.size).toMap
    val pushedScans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.metadata.get("PushedFilters").exists(_ != "[]") => 1
    }.sum
    counts + ("PushedFilterScans" -> pushedScans)
  }

  /** Digest one SparkEntry query with AQE pinned OFF for the planning
    * (restored after), so the digest is the deterministic pre-execution
    * plan rather than whatever AQE rewrote it into at runtime. */
  def digestFor(spark: SparkSession, name: String, sfDir: String): Map[String, Int] = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try digest(graft.SparkEntry.queries(name)(spark, sfDir))
    finally spark.conf.set(key, prev)
  }

  /** One diff-friendly line per query: `name k1=v1 k2=v2 …`, keys
    * sorted — the committed snapshot format. */
  def render(name: String, d: Map[String, Int]): String =
    name + " " + d.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")

  def parse(line: String): (String, Map[String, Int]) = {
    val parts = line.trim.split("\\s+")
    (parts.head, parts.tail.map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v.toInt
    }.toMap)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else DefaultSfDir
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = Tracked.map(n => render(n, digestFor(spark, n, sfDir)))
    val body = ("# Physical-plan structural digests (PlanDigest tool; " +
      s"sf=$sfDir, AQE off).\n" +
      "# Regenerate intentionally: sbt \"runMain graft.tools.PlanDigest\"\n" +
      lines.mkString("\n")) + "\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(SnapshotPath),
      body.getBytes("UTF-8"))
    println(body)
    spark.stop()
  }
}
