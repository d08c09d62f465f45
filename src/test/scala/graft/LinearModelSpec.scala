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
