package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embedding preprocessing: per-dimension stats, centering, L2
  * normalization — literal values on tiny vectors, invariants on the
  * composed pipeline, kernel/HOF parity for the two normalize forms. */
class EmbeddingStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tiny = Seq(
    (1L, Array(1.0f, 0.0f, 2.0f)),
    (2L, Array(3.0f, 0.0f, 4.0f)),
    (3L, Array(5.0f, 0.0f, 0.0f))).toDF("id", "v")

  test("dimStats: exact mean and population variance per dimension") {
    val rows = Similarity.dimStats(tiny, "v").orderBy("pos")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(rows.map(_._1) == Seq(1, 2, 3))
    assert(rows.forall(_._2 == 3L))
    def near(a: Double, b: Double, tol: Double = 1e-6) = math.abs(a - b) <= tol
    val means = rows.map(_._3)
    assert(near(means(0), 3.0))            // (1+3+5)/3
    assert(means(1) == 0.0)
    assert(near(means(2), 2.0))            // (2+4+0)/3
    val vars = rows.map(_._4)
    assert(near(vars(0), 8.0 / 3))         // E[x²]−mean² = 35/3 − 9
    assert(vars(1) == 0.0)
    assert(near(vars(2), 8.0 / 3))
  }

  test("centerVectors: centered dimensions sum to ~0; shape preserved") {
    val c = Similarity.centerVectors(tiny, "v", "c")
    assert(c.columns.toSeq == Seq("id", "v", "c"))
    val sums = c.select(posexplode(col("c")).as(Seq("p", "x")))
      .groupBy("p").agg(sum("x").as("s")).orderBy("p")
      .as[(Int, Double)].collect().map(_._2)
    assert(sums.forall(math.abs(_) < 1e-6))
  }

  test("l2Normalize: unit norm, zero vector passes through, forms agree") {
    val df = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f))).toDF("id", "v")
    val a = df.select(col("id"), Similarity.l2Normalize(col("v")).as("u"))
      .orderBy("id").as[(Long, Seq[Double])].collect()
    assert(a(0)._2 == Seq(0.6, 0.8))
    assert(a(1)._2 == Seq(0.0, 0.0))       // no NaN from the zero norm
    val b = Similarity.l2NormalizeCol(df, "v", "u")
      .orderBy("id").select("u").as[Seq[Double]].collect()
    assert(a.map(_._2).toSeq == b.toSeq)   // column and frame forms agree
    // composed: center → normalize leaves every non-degenerate row unit
    val unit = Similarity.l2NormalizeCol(
      Similarity.centerVectors(tiny, "v", "c"), "c", "u")
    val norms = unit.select(Similarity.norm(col("u"))).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
  }

  test("powerIteration converges to the dominant eigenvector, exactly reproducibly") {
    // Σ x·xᵀ = diag(4, 1): dominant direction is e1; the uniform positive
    // start pins the sign
    val m = Seq((1L, Array(2.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("id", "v")
    val v = Similarity.powerIteration(m, "id", "v", dim = 2, iters = 4)
      .orderBy("pos").as[(Int, Double)].collect()
    assert(v.map(_._1).toSeq == Seq(1, 2))
    assert(v(0)._2 > 0.999 && math.abs(v(1)._2) < 0.05)
    assert(math.abs(v.map(t => t._2 * t._2).sum - 1.0) < 1e-6)
    // bit-exact determinism across runs (quantized trajectory)
    val again = Similarity.powerIteration(m, "id", "v", dim = 2, iters = 4)
      .orderBy("pos").as[(Int, Double)].collect()
    assert(v.map(_._2).toSeq == again.map(_._2).toSeq)
    // PCA composition: centered points along y=x give the (1,1)/√2 axis
    val line = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(2.0f, 2.0f)),
      (3L, Array(4.0f, 4.0f))).toDF("id", "v")
    val pc = Similarity.powerIteration(
        Similarity.centerVectors(line, "v", "c"), "id", "c", dim = 2, iters = 3)
      .orderBy("pos").as[(Int, Double)].collect().map(_._2)
    assert(math.abs(pc(0) - pc(1)) < 1e-9 &&
      math.abs(pc(0) - 1.0 / math.sqrt(2)) < 1e-6)
    assertThrows[IllegalArgumentException](
      Similarity.powerIteration(m, "id", "v", dim = 2, iters = 0))
  }

  test("marginPairs matches a brute-force reference and filters by margin") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(4)(rnd.nextFloat() * 2 - 1)
    val aRows = (0L until 6L).map(i => (i, vec()))
    val bRows = (100L until 108L).map(i => (i, vec()))
    val a = aRows.toDF("vec_id", "embedding")
    val b = bRows.toDF("vec_id", "embedding")
    val k = 3
    // reference: plain-Scala brute force with the operator's own
    // quantized-average convention
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val d = x.indices.map(i => x(i).toDouble * y(i).toDouble).sum
      d / (math.sqrt(x.map(v => v.toDouble * v.toDouble).sum) *
        math.sqrt(y.map(v => v.toDouble * v.toDouble).sum))
    }
    def avgK(sims: Seq[Double]): Double = {
      val top = sims.sorted.reverse.take(k)
      top.map(s => math.floor(s * 1e9).toLong).sum.toDouble / (top.size * 1e9)
    }
    val avgA = aRows.map { case (ai, av) =>
      ai -> avgK(bRows.map(br => cos(av, br._2))) }.toMap
    val avgB = bRows.map { case (bi, bv) =>
      bi -> avgK(aRows.map(ar => cos(bv, ar._2))) }.toMap
    val expected = aRows.flatMap { case (ai, av) =>
      val cands = bRows.map { case (bi, bv) => (bi, cos(av, bv)) }
        .sortBy(t => (-t._2, t._1)).take(k)
        .map { case (bi, c) => (bi, c, c / ((avgA(ai) + avgB(bi)) / 2)) }
      val best = cands.maxBy(t => (t._3, -t._1))
      if (best._3 >= 1.0) Some((ai, best._1, best._3)) else None
    }
    val got = Similarity.marginPairs(a, b, "vec_id", "embedding", k, 1.0)
      .orderBy("a_id").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("margin"))).toSeq
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"margin ${g._3} vs ${e._3}") }
    // a high threshold prunes: every surviving margin clears it
    val strict = Similarity.marginPairs(a, b, "vec_id", "embedding", k, 1.2)
      .collect().map(_.getAs[Double]("margin"))
    assert(strict.forall(_ >= 1.2) &&
      strict.length == expected.count(_._3 >= 1.2))
  }

  test("simplifiedSilhouette: hand-quantized 1-d geometry, ties to min cid") {
    val cents = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("cid", "cv")
    val pts = Seq(
      (10L, Array(0.25f, 0.0f)), // a=250000^2 (c1), b=750000^2 -> s=8/9
      (11L, Array(1.0f, 0.0f)),  // ON c2: a=0, b=1e12 -> s=1
      (12L, Array(0.5f, 0.0f))   // equidistant -> c1 by tie-break, s=0
    ).toDF("id", "v")
    val r = Similarity.simplifiedSilhouette(pts, "id", "v",
        cents, "cid", "cv")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    val s89 = math.floor(1e9 * (562500000000L - 62500000000L).toDouble /
      562500000000L.toDouble).toLong
    assert(r(1L) == ((2L, s89.toDouble / 2 / 1e9)))
    assert(r(2L) == ((1L, 1.0)))
  }
}
