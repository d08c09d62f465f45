package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Link-graph analytics: hand-verifiable integer PageRank on a fixed
  * 3-node graph, a brute-force driver-side differential on a denser
  * graph, invariants (self-loop drop, parallel-edge collapse, dangling
  * teleport floor), and degree stats. */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = GraphOps.Scale

  /** Driver-side reference: the same integer recursion, naive maps —
    * including the uniform dangling-mass redistribution (dangling rank
    * re-enters through the teleport support each round). */
  private def brute(edges: Seq[(String, String, Long)], iters: Int,
                    num: Long = 85L, den: Long = 100L): Map[String, Long] = {
    val agg = edges.filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map { case ((s0, d), es) => (s0, d, es.map(_._3).sum) }.toSeq
    val outW = agg.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    val nodes = (agg.map(_._1) ++ agg.map(_._2)).distinct
    val dangling = nodes.filterNot(outW.contains).toSet
    val teleport = (den - num) * S / den
    var r = nodes.map(_ -> S).toMap
    for (_ <- 1 to iters) {
      val inflow = agg.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s0, _, w) => r(s0) * w / outW(s0) }.sum
      }
      val share =
        if (nodes.isEmpty) 0L
        else dangling.iterator.map(r).sum / nodes.size
      r = nodes.map(n =>
        n -> (teleport + num * (inflow.getOrElse(n, 0L) + share) / den)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] =
    GraphOps.pageRankNano(edges.toDF("src", "dst", "w"), "src", "dst", col("w"), iters)
      .as[(String, Long)].collect().toMap

  test("pageRankNano: 3-node cycle is symmetric and conserves mass exactly") {
    // a -> b -> c -> a, unit weights: every node keeps rank exactly 1.0
    // (each round: inflow = r, rank = 0.15e9 + 0.85e9 = 1e9, no floor loss)
    val got = run(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)), iters = 4)
    assert(got == Map("a" -> S, "b" -> S, "c" -> S))
  }

  test("pageRankNano: hub-and-spoke hand computation") {
    // a->b, a->c (split), b->a, c->a; 1 iteration from uniform seed:
    // inflow(b)=inflow(c)=1e9*1 DIV 2=5e8; inflow(a)=1e9+1e9=2e9
    // r(b)=r(c)=0.15e9+0.85*5e8 DIV 1 -> 150000000+425000000=575000000
    // r(a)=150000000+85*2e9 DIV 100=1850000000
    val got = run(Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L)), 1)
    assert(got == Map("a" -> 1850000000L, "b" -> 575000000L, "c" -> 575000000L))
  }

  test("pageRankNano: matches the driver-side brute force on a dense weighted graph") {
    // deterministic pseudo-random graph over 12 nodes (no RNG: residue mix)
    val nodes = (0 until 12).map(i => s"n$i")
    val edges = for {
      i <- 0 until 12; j <- 0 until 12
      if i != j && (i * 7 + j * 3) % 5 < 2
    } yield (nodes(i), nodes(j), ((i * 13 + j * 11) % 9 + 1).toLong)
    for (iters <- Seq(1, 3, 5))
      assert(run(edges, iters) == brute(edges, iters), s"iters=$iters")
  }

  test("pageRankNano: self-loops dropped, parallel edges collapse into summed weight") {
    // b's only inflow is via the (a,b) edges; the a self-loop must not feed a
    val withNoise = Seq(("a", "a", 50L), ("a", "b", 2L), ("a", "b", 3L), ("b", "a", 1L))
    val clean = Seq(("a", "b", 5L), ("b", "a", 1L))
    assert(run(withNoise, 3) == run(clean, 3))
  }

  test("pageRankNano: dangling mass redistributes uniformly; total conserved") {
    // a -> b only: b is dangling — its rank re-enters as DIV-2 shares.
    // round 1: inflow(b)=1e9; dang=r0(b)=1e9, share=5e8
    //   r(a)=15e7+85*5e8 DIV 100=575000000
    //   r(b)=15e7+85*(1e9+5e8) DIV 100=1425000000          (Σ=2e9)
    // round 2: inflow(b)=r(a)=575000000; dang=r(b)=1425000000, share=712500000
    //   r(a)=15e7+85*712500000 DIV 100=755625000
    //   r(b)=15e7+85*(575000000+712500000) DIV 100=1244375000 (Σ=2e9)
    val g1 = run(Seq(("a", "b", 1L)), 1)
    assert(g1 == Map("a" -> 575000000L, "b" -> 1425000000L))
    val got = run(Seq(("a", "b", 1L)), 2)
    assert(got == Map("a" -> 755625000L, "b" -> 1244375000L))
    assert(got.values.sum == 2 * S) // exact conservation on this graph
  }

  test("pageRankNano: mass conservation within the integer-floor bound on a dangling-heavy graph") {
    // dense 12-node core plus two pure sinks — every round sheds ≤1 nano
    // per edge (contribution DIV) + ≤2 per node (damping DIV + share
    // remainder), so total mass stays within iters·(E + 2N) nanos of
    // N·Scale instead of leaking ~15% per round like the old variant
    val nodes = (0 until 12).map(i => s"n$i")
    val core = for {
      i <- 0 until 12; j <- 0 until 12
      if i != j && (i * 7 + j * 3) % 5 < 2
    } yield (nodes(i), nodes(j), ((i * 13 + j * 11) % 9 + 1).toLong)
    val edges = core ++ Seq(("n0", "sinkA", 5L), ("n3", "sinkB", 2L))
    for (iters <- Seq(1, 4)) {
      val got = run(edges, iters)
      assert(got == brute(edges, iters), s"iters=$iters")
      val n = got.size.toLong
      val bound = iters.toLong * (edges.size.toLong + 2 * n)
      val total = got.values.sum
      assert(math.abs(total - n * S) <= bound,
        s"iters=$iters total=$total expected≈${n * S} bound=$bound")
    }
  }

  private def runSeeded(edges: Seq[(String, String, Long)], iters: Int,
                        seeds: Seq[String]): Map[String, Long] =
    GraphOps.pageRankNano(edges.toDF("src", "dst", "w"), "src", "dst",
        col("w"), iters, seeds = Some(seeds.toDF("node")))
      .as[(String, Long)].collect().toMap

  test("trustrank: teleport only on seeds, hand computation") {
    // a <-> b, seed {a}:
    // r0: a=1e9 b=0
    // i1: r(b) = 0 + 85*1e9 DIV 100 = 850000000; r(a) = 150000000 + 0
    // i2: r(b) = 0 + 85*150000000 DIV 100 = 127500000
    //     r(a) = 150000000 + 85*850000000 DIV 100 = 872500000
    val g = Seq(("a", "b", 1L), ("b", "a", 1L))
    assert(runSeeded(g, 1, Seq("a")) == Map("a" -> 150000000L, "b" -> 850000000L))
    assert(runSeeded(g, 2, Seq("a")) == Map("a" -> 872500000L, "b" -> 127500000L))
  }

  test("trustrank: nodes unreachable from seeds decay to exactly 0") {
    // c -> b with seed {a}: c gets no teleport and no inflow — exact 0,
    // not an epsilon tail; seeds absent from the graph are ignored.
    // b is dangling, so its mass re-enters on the seed set ({a}, ns=1):
    // r1: a=15e7 (dang was 0), b=85e7, c=0
    // r2: dang=85e7 → a=15e7+85*(0+85e7) DIV 100=872500000; b=127500000
    // r3: dang=127500000 → a=15e7+85*127500000 DIV 100=258375000
    //     b=85*872500000 DIV 100=741625000
    val g = Seq(("a", "b", 1L), ("c", "b", 1L))
    val got = runSeeded(g, 3, Seq("a", "not-in-graph"))
    assert(got("c") == 0L)
    assert(got("a") == 258375000L) // teleport + b's redistributed mass
    assert(got("b") == 741625000L)
  }

  test("trustrank: full damping (zero teleport) still seeds from the explicit flag") {
    // a <-> b, seed {a}, damping 100/100 → teleport = 0: seedness must
    // come from the spine's is_seed flag, not `tele > 0` (which would
    // zero every rank). 1 iteration: inflow(b) = r0(a) = 1e9 → r(b) =
    // 100·1e9 DIV 100 = 1e9; inflow(a) = r0(b) = 0 → r(a) = 0.
    val g = Seq(("a", "b", 1L), ("b", "a", 1L))
    val got = runSeededDamped(g, 1, Seq("a"), 100L, 100L)
    assert(got == Map("a" -> 0L, "b" -> 1000000000L))
  }

  private def runSeededDamped(edges: Seq[(String, String, Long)], iters: Int,
                              seeds: Seq[String], num: Long,
                              den: Long): Map[String, Long] =
    GraphOps.pageRankNano(edges.toDF("src", "dst", "w"), "src", "dst",
        col("w"), iters, dampNum = num, dampDen = den,
        seeds = Some(seeds.toDF("node")))
      .as[(String, Long)].collect().toMap

  test("pageRankNano: damping fraction validated") {
    val e = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      GraphOps.pageRankNano(e, "src", "dst", col("w"), 1, dampNum = 101L)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pageRankNano(e, "src", "dst", col("w"), 0)
    }
  }

  test("pageRankNano: degenerate graphs (empty edges, all self-loops) return empty") {
    val empty = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(GraphOps.pageRankNano(empty, "src", "dst", col("w"), 2).count() == 0L)
    val loops = Seq(("a", "a", 3L)).toDF("src", "dst", "w")
    assert(GraphOps.pageRankNano(loops, "src", "dst", col("w"), 2).count() == 0L)
  }

  // ---- HITS -------------------------------------------------------------

  private def runHits(edges: Seq[(String, String, Long)],
                      iters: Int): Map[String, (Long, Long)] =
    GraphOps.hitsNano(edges.toDF("src", "dst", "w"), "src", "dst", col("w"), iters)
      .as[(String, Long, Long)].collect()
      .map { case (n, h, a) => n -> ((h, a)) }.toMap

  /** Driver-side reference: same integer recursion, naive maps. */
  private def bruteHits(edges: Seq[(String, String, Long)],
                        iters: Int): Map[String, (Long, Long)] = {
    val agg = edges.filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map { case ((s0, d), es) => (s0, d, es.map(_._3).sum) }.toSeq
    val nodes = (agg.map(_._1) ++ agg.map(_._2)).distinct
    def norm(raw: Map[String, Long]): Map[String, Long] = {
      val q = math.max(raw.values.sum / S, 1L)
      raw.map { case (k, v) => k -> v / q }
    }
    var hub = nodes.map(_ -> S).toMap
    var auth = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      auth = norm(agg.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s0, _, w) => hub.getOrElse(s0, 0L) * w }.sum
      })
      hub = norm(agg.groupBy(_._1).map { case (s0, es) =>
        s0 -> es.map { case (_, d, w) => auth.getOrElse(d, 0L) * w }.sum
      })
    }
    nodes.map(n => n -> ((hub.getOrElse(n, 0L), auth.getOrElse(n, 0L)))).toMap
  }

  test("hitsNano: hand computation on a 2-authority funnel") {
    // a->b, c->b, b->d; 1 iteration from hub0 = 1e9:
    // rawA: b=2e9, d=1e9; tot=3e9, q=3 -> auth(b)=666666666, auth(d)=333333333
    // rawH: a=c=666666666, b=333333333; tot=1666666665, q=1 (tot DIV 1e9 = 1)
    val got = runHits(Seq(("a", "b", 1L), ("c", "b", 1L), ("b", "d", 1L)), 1)
    assert(got == Map(
      "a" -> ((666666666L, 0L)),
      "b" -> ((333333333L, 666666666L)),
      "c" -> ((666666666L, 0L)),
      "d" -> ((0L, 333333333L))))
  }

  test("hitsNano: matches the driver-side brute force on a dense weighted graph") {
    val nodes = (0 until 12).map(i => s"n$i")
    val edges = for {
      i <- 0 until 12; j <- 0 until 12
      if i != j && (i * 7 + j * 3) % 5 < 2
    } yield (nodes(i), nodes(j), ((i * 13 + j * 11) % 9 + 1).toLong)
    for (iters <- Seq(1, 3))
      assert(runHits(edges, iters) == bruteHits(edges, iters), s"iters=$iters")
  }

  test("hitsNano: self-loops dropped, parallel edges collapse") {
    val noisy = Seq(("a", "a", 9L), ("a", "b", 2L), ("a", "b", 3L), ("b", "a", 1L))
    val clean = Seq(("a", "b", 5L), ("b", "a", 1L))
    assert(runHits(noisy, 2) == runHits(clean, 2))
  }

  // ---- label propagation ------------------------------------------------

  test("labelPropagation: two weakly-bridged triangles settle into two communities") {
    // triangles {a,b,c} and {x,y,z} at weight 10, bridge (c,x) at 1;
    // the deterministic max-weight/min-label rule converges by round 2
    val tri = Seq(("a", "b", 10L), ("b", "c", 10L), ("a", "c", 10L),
      ("x", "y", 10L), ("y", "z", 10L), ("x", "z", 10L), ("c", "x", 1L))
    val got = GraphOps.labelPropagation(tri.toDF("src", "dst", "w"),
        "src", "dst", col("w"), iters = 3)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "x"))
  }

  test("labelPropagation: direction is ignored (undirected voting)") {
    val fwd = Seq(("a", "b", 5L), ("b", "c", 5L))
    val rev = Seq(("b", "a", 5L), ("c", "b", 5L))
    def run(e: Seq[(String, String, Long)]) =
      GraphOps.labelPropagation(e.toDF("src", "dst", "w"), "src", "dst",
        col("w"), 2).as[(String, String)].collect().toMap
    assert(run(fwd) == run(rev))
  }

  // ---- triangles --------------------------------------------------------

  private def runTri(edges: Seq[(String, String)]): Map[String, (Long, Long)] =
    GraphOps.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .as[(String, Long, Long)].collect()
      .map { case (n, d, t) => n -> ((d, t)) }.toMap

  test("triangleCounts: K4 plus a pendant node") {
    // K4: every node sits in C(3,2)=3 triangles; pendant e adds none
    val k4 = for {
      (u, i) <- Seq("a", "b", "c", "d").zipWithIndex
      (v, j) <- Seq("a", "b", "c", "d").zipWithIndex if i < j
    } yield (u, v)
    val got = runTri(k4 :+ (("a", "e")))
    assert(got == Map("a" -> ((4L, 3L)), "b" -> ((3L, 3L)), "c" -> ((3L, 3L)),
      "d" -> ((3L, 3L)), "e" -> ((1L, 0L))))
  }

  test("triangleCounts: reciprocal/parallel edges and self-loops collapse") {
    val noisy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a"),
      ("a", "a"))
    val clean = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    assert(runTri(noisy) == runTri(clean))
    assert(runTri(clean) == Map("a" -> ((2L, 1L)), "b" -> ((2L, 1L)),
      "c" -> ((2L, 1L))))
  }

  test("triangleCounts: square without diagonals has zero triangles") {
    val sq = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    assert(runTri(sq).values.forall(_._2 == 0L))
  }

  // ---- k-core -----------------------------------------------------------

  private def runKCore(edges: Seq[(String, String)], k: Int,
                       rounds: Int): Map[String, Long] =
    GraphOps.kCore(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .as[(String, Long)].collect().toMap

  test("kCore: square survives k=2, pendant peels in round one") {
    // cycle a-b-c-d (all deg 2) + pendant (a,e): round 1 drops e (deg 1),
    // round 2 re-measures the induced square — stable at deg 2
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "e"))
    assert(runKCore(g, k = 2, rounds = 2) ==
      Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 2L))
  }

  test("kCore: peel cascade empties a path graph at k=2") {
    // path a-b-c-d: endpoints peel, then the ex-middle endpoints peel...
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    assert(runKCore(g, k = 2, rounds = 3).isEmpty)
  }

  test("kCore: rounds only truncate toward the fixpoint, never overshoot") {
    // K4 + a tail: the K4 is the exact 3-core; extra rounds are no-ops
    val k4 = for {
      (u, i) <- Seq("a", "b", "c", "d").zipWithIndex
      (v, j) <- Seq("a", "b", "c", "d").zipWithIndex if i < j
    } yield (u, v)
    val g = k4 ++ Seq(("d", "t1"), ("t1", "t2"))
    val expected = Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L)
    assert(runKCore(g, k = 3, rounds = 2) == expected)
    assert(runKCore(g, k = 3, rounds = 4) == expected)
  }

  // ---- brute-force differentials on a pseudo-random graph ---------------

  /** Deterministic pseudo-random undirected simple graph over n nodes
    * (residue mix, no RNG): returns directed edge tuples with noise
    * (some reciprocals + self-loops) so the collapse paths are live. */
  private def pseudoGraph(n: Int): Seq[(String, String)] = {
    val base = for {
      i <- 0 until n; j <- 0 until n
      if i != j && (i * 11 + j * 5) % 7 < 2
    } yield (s"n$i", s"n$j")
    base ++ Seq(("n0", "n0"), ("n1", "n0")) // self-loop + reciprocal noise
  }

  private def undSimple(edges: Seq[(String, String)]): Set[(String, String)] =
    edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) (e._1, e._2) else (e._2, e._1)).toSet

  test("triangleCounts: matches brute-force enumeration on a pseudo-random graph") {
    val edges = pseudoGraph(18)
    val und = undSimple(edges)
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def adj(a: String, b: String) =
      und.contains(if (a < b) (a, b) else (b, a))
    val bruteTri = nodes.map { v =>
      val cnt = (for {
        a <- nodes; b <- nodes
        if a < b && adj(v, a) && adj(v, b) && adj(a, b)
      } yield 1).size
      v -> cnt.toLong
    }.toMap
    val bruteDeg = nodes.map(v => v -> nodes.count(adj(v, _)).toLong).toMap
    val got = runTri(edges)
    assert(got == nodes.map(v => v -> ((bruteDeg(v), bruteTri(v)))).toMap)
  }

  test("kCore: matches brute-force synchronous peeling on a pseudo-random graph") {
    val edges = pseudoGraph(16)
    for (k <- Seq(2, 3, 4); rounds <- Seq(1, 3)) {
      var active = undSimple(edges).flatMap(e => Seq(e._1, e._2))
      var deg = Map.empty[String, Long]
      for (_ <- 1 to rounds) {
        val er = undSimple(edges).filter(e =>
          active.contains(e._1) && active.contains(e._2))
        deg = (er.toSeq.map(_._1) ++ er.toSeq.map(_._2))
          .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
        deg = deg.filter(_._2 >= k)
        active = deg.keySet
      }
      assert(runKCore(edges, k, rounds) == deg, s"k=$k rounds=$rounds")
    }
  }

  test("labelPropagation: matches brute-force synchronous voting on a pseudo-random graph") {
    val edges = pseudoGraph(14).map { case (a, b) => (a, b, 1L) } ++
      Seq(("n1", "n2", 5L)) // a weighted parallel edge exercises the collapse
    // brute: undirected weight map, sync rounds, max-weight/min-label
    val w = scala.collection.mutable.Map.empty[(String, String), Long]
    edges.filter(e => e._1 != e._2).foreach { case (a, b, x) =>
      w((a, b)) = w.getOrElse((a, b), 0L) + x
      w((b, a)) = w.getOrElse((b, a), 0L) + x
    }
    val nodes = w.keys.map(_._1).toSeq.distinct.sorted
    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = nodes.map { v =>
        // NB: .toSeq first — collect on a Map would rebuild a Map and
        // silently overwrite same-label votes from different neighbors
        val votes = w.toSeq.collect { case ((`v`, nbr), x) => (lbl(nbr), x) }
          .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
        v -> votes.toSeq.minBy { case (l, x) => (-x, l) }._1
      }.toMap
    }
    val got = GraphOps.labelPropagation(
        edges.toDF("src", "dst", "w"), "src", "dst", col("w"), iters = 3)
      .as[(String, String)].collect().toMap
    assert(got == lbl)
  }

  test("coVisitation: shared-key pair counts; duplicates collapse") {
    val rel = Seq(("k1", "a"), ("k1", "b"), ("k1", "c"), ("k1", "c"),
      ("k2", "b"), ("k2", "c")).toDF("k", "item")
    val got = GraphOps.coVisitation(rel, "k", "item", maxPerKey = 10)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 2L)))
  }

  test("coVisitation: md5 cap bounds a promiscuous key's fan-out") {
    val hot = (0 until 40).map(i => ("hot", s"i$i"))
    val rel = (hot ++ Seq(("cold", "i0"), ("cold", "i1"))).toDF("k", "item")
    val pairs = GraphOps.coVisitation(rel, "k", "item", maxPerKey = 5)
      .as[(String, String, Long)].collect()
    // hot contributes C(5,2)=10 pairs, cold at most 1 — and determinism:
    // the same call yields the same kept subset
    assert(pairs.map(_._3).sum <= 11L)
    assert(pairs.length <= 11)
    val again = GraphOps.coVisitation(rel, "k", "item", maxPerKey = 5)
      .as[(String, String, Long)].collect()
    assert(pairs.sortBy(p => (p._1, p._2)).toSeq ==
      again.sortBy(p => (p._1, p._2)).toSeq)
  }

  test("hitsNano: degenerate graphs (empty, all self-loops) return empty") {
    val empty = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(GraphOps.hitsNano(empty, "src", "dst", col("w"), 2).count() == 0L)
    val loops = Seq(("a", "a", 3L)).toDF("src", "dst", "w")
    assert(GraphOps.hitsNano(loops, "src", "dst", col("w"), 2).count() == 0L)
  }

  // ---- deterministicWalks -------------------------------------------

  private def md5hex(s: String): String = TestReplay.md5hex(s)

  /** Driver-side replay of the walk recursion: same md5 key, same
    * (md5, dst) total order, same dangling truncation. */
  private def bruteWalks(edges: Seq[(String, String)], steps: Int,
                         reps: Int): Set[(String, Int, String)] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val adj = e.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val out = scala.collection.mutable.Set[(String, Int, String)]()
    for (start <- adj.keys; i <- 0 until reps) {
      val wid = s"$start#$i"
      out += ((wid, 0, start))
      var cur = start
      var t = 1
      var alive = true
      while (t <= steps && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            cur = nbrs.minBy(d => (md5hex(s"$wid|$t|$d"), d))
            out += ((wid, t, cur))
          case None => alive = false
        }
        t += 1
      }
    }
    out.toSet
  }

  test("deterministicWalks: matches the driver-side md5 replay, " +
       "truncates at dangling nodes, replicas get distinct ids") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("c", "d"), ("b", "b"), ("a", "b")) // self-loop + dup exercised
    val got = GraphOps.deterministicWalks(
        edges.toDF("src", "dst"), "src", "dst", steps = 3, walksPerNode = 2)
      .as[(String, Int, String)].collect().toSet
    assert(got == bruteWalks(edges, steps = 3, reps = 2))
    // d is dangling: it never STARTS a walk (no out-edge), and any walk
    // reaching it stops there
    assert(!got.exists(_._1.startsWith("d#")))
    val reached = got.filter(_._3 == "d")
    assert(reached.forall { case (wid, step, _) =>
      !got.exists(r => r._1 == wid && r._2 > step) })
    // both replicas exist per starting node
    assert(got.map(_._1).count(_.startsWith("a#")) >= 2)
  }

  test("deterministicWalks: materializeEvery does not change the corpus") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "b"))
      .toDF("src", "dst")
    val every1 = GraphOps.deterministicWalks(edges, "src", "dst",
      steps = 4, walksPerNode = 1, materializeEvery = 1)
      .as[(String, Int, String)].collect().toSet
    val every3 = GraphOps.deterministicWalks(edges, "src", "dst",
      steps = 4, walksPerNode = 1, materializeEvery = 3)
      .as[(String, Int, String)].collect().toSet
    assert(every1 == every3)
  }

  test("degreeStats: full outer over directions with zero-filled blanks") {
    val e = Seq(("a", "b", 2L), ("a", "c", 3L), ("b", "c", 4L)).toDF("src", "dst", "w")
    val got = GraphOps.degreeStats(e, "src", "dst", col("w"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (n, a, b, c, d) => n -> ((a, b, c, d)) }.toMap
    assert(got("a") == ((2L, 5L, 0L, 0L)))   // pure source
    assert(got("b") == ((1L, 4L, 1L, 2L)))
    assert(got("c") == ((0L, 0L, 2L, 7L)))   // pure sink
  }
}
