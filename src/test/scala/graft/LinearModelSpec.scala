package graft

import graft.operators.LinearModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-engine logistic regression: the first GD step is exactly
  * hand-computable (σ(0) = 1/2 makes every term rational), the decision
  * readout follows the fitted sign, and the whole trajectory must be
  * partitioning-invariant (DECIMAL-exact gradient sums). */
class LinearModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pts2 = Seq(
    (Array(1.0f), 1), (Array(-1.0f), 0)).toDF("v", "y")

  test("logisticFit: one step from zero by hand (w=0.25, b=0)") {
    // z=0, s=1/2 everywhere: g1 = (1/2-1)*1 + (1/2-0)*(-1) = -1, gb=0
    // w1 = q9(0 - 0.5*(-1)/2) = 0.25, b1 = 0
    val w = LinearModel.logisticFit(pts2, "v", "y", dim = 1, iters = 1,
        lr = 0.5)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(w(1) == 0.25 && w(0) == 0.0)
  }

  test("logisticConfusion: fitted sign separates the two points") {
    val w = LinearModel.logisticFit(pts2, "v", "y", dim = 1, iters = 1,
      lr = 0.5)
    val conf = LinearModel.logisticConfusion(pts2, "v", "y", w)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(conf == Map((1L, 1) -> 1L, (0L, 0) -> 1L))
  }

  test("hashedTfVectors: normalized, deterministic, fixed-dim") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b a"), (2L, "a b a"), (3L, ""), (4L, "c"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.hashedTfVectors(docs, "doc_id", "text", dim = 4)
      .collect().map(x => x.getLong(0) ->
        (x.getSeq[Double](1), x.getLong(2))).toMap
    assert(!r.contains(3L))                       // zero-token doc drops
    assert(r(1L)._2 == 3 && r(4L)._2 == 1)
    assert(r(1L)._1.length == 4)
    assert(math.abs(r(1L)._1.sum - 4.0) < 1e-12)  // dim-scaled tf sums to dim
    assert(r(1L)._1 == r(2L)._1)                  // same text, same vector
    assert(r(1L)._1.count(_ > 0) <= 2)            // at most 2 buckets hit
  }

  test("logisticFitSparse: identical trajectory to the dense form") {
    val base = Seq.tabulate(30) { i =>
      (i.toLong,
        Array(math.sin(i * 1.3).toFloat, math.cos(i * 2.1).toFloat), i % 2)
    }.toDF("id", "v", "y")
    val dense = LinearModel.logisticFit(base, "v", "y", dim = 2,
        iters = 4, lr = 0.5)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val pairs = base.select(col("id"),
        posexplode(col("v")).as(Seq("p0", "x")), col("y"))
      .select(col("id"), (col("p0") + 1).as("pos"), col("x"), col("y"))
    val sparse = LinearModel.logisticFitSparse(pairs, "id", "pos", "x",
        "y", dim = 2, iters = 4, lr = 0.5)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(dense == sparse)
    // and the two confusion readouts agree
    val cd = LinearModel.logisticConfusion(base, "v", "y",
        Seq((0, sparse(0)), (1, sparse(1)), (2, sparse(2)))
          .toDF("pos", "weight"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val cs = LinearModel.logisticConfusionSparse(pairs, "id", "pos", "x",
        "y", Seq((0, sparse(0)), (1, sparse(1)), (2, sparse(2)))
          .toDF("pos", "weight"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cd == cs)
  }

  test("hashedTfPairs: densified pairs equal hashedTfVectors") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b a c"), (2L, "b")).toDF("doc_id", "text")
    val dense = TextAnalysis.hashedTfVectors(docs, "doc_id", "text", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val sparse = TextAnalysis.hashedTfPairs(docs, "doc_id", "text", dim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    for ((id, v) <- dense; j <- 1 to 8)
      assert(v(j - 1) == sparse.getOrElse((id, j), 0.0))
  }

  test("logisticFit: trajectory invariant to input partitioning") {
    val base = Seq.tabulate(40) { i =>
      (Array(math.sin(i * 1.7).toFloat, math.cos(i * 0.9).toFloat),
        i % 2)
    }.toDF("v", "y")
    def fit(df: org.apache.spark.sql.DataFrame) =
      LinearModel.logisticFit(df, "v", "y", dim = 2, iters = 4, lr = 0.5)
        .orderBy("pos").collect().map(r => (r.getInt(0), r.getDouble(1)))
        .toSeq
    assert(fit(base.repartition(1)) == fit(base.repartition(13)))
  }
}
