package graft

import graft.operators.TreeModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Histogram decision tree: the one-feature stump is exactly
  * hand-computable (integer histograms, rational ginis), pure children
  * must NOT split (gain 0 is not > 0), the confusion readout follows
  * the leaf majorities, and the fitted tree must be invariant to input
  * partitioning (integer-count histograms). */
class TreeModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one feature, bins of width 1 over [0,4): a perfectly separable step
  private def pts4 = Seq(
    (Array(0.5f), 0), (Array(1.5f), 0), (Array(2.5f), 1), (Array(3.5f), 1))
    .toDF("v", "y")

  test("treeFit: hand-computed stump (split after bin 1, qgain = 1e9)") {
    val nodes = TreeModel.treeFit(pts4, "v", "y", nFeatures = 1, bins = 4,
        lo = 0.0, hi = 4.0, depth = 1)
      .collect().map(r => r.getInt(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some((r.getInt(4), r.getInt(5),
            r.getDouble(6), r.getLong(7)))))
      .toMap
    // gp = 2·2/4 = 1.0; the b=1 candidate yields two pure children →
    // gain exactly 1.0 → qgain 10^9; threshold = 0 + 1·(1+1) = 2.0
    assert(nodes(1) == ((0, 4L, 2L, Some((1, 1, 2.0, 1000000000L)))))
    assert(nodes(2) == ((1, 2L, 0L, None)))
    assert(nodes(3) == ((1, 2L, 2L, None)))
  }

  test("treeFit: pure children do not split at depth 2 (gain 0 not > 0)") {
    val nodes = TreeModel.treeFit(pts4, "v", "y", nFeatures = 1, bins = 4,
        lo = 0.0, hi = 4.0, depth = 2)
      .collect()
    assert(nodes.length == 3) // root + two terminal leaves, no level-2 rows
    assert(nodes.count(_.isNullAt(4)) == 2)
  }

  test("treeConfusion: leaf majorities reproduce the separable labels") {
    val tree = TreeModel.treeFit(pts4, "v", "y", nFeatures = 1, bins = 4,
      lo = 0.0, hi = 4.0, depth = 1)
    val conf = TreeModel.treeConfusion(pts4, "v", "y", tree, nFeatures = 1,
        bins = 4, lo = 0.0, hi = 4.0)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(conf == Map((0L, 0) -> 2L, (1L, 1) -> 2L))
  }

  test("treeFit: fitted tree invariant to input partitioning") {
    val base = Seq.tabulate(120) { i =>
      (Array(math.sin(i * 1.3).toFloat, math.cos(i * 0.7).toFloat,
        math.sin(i * 2.9).toFloat), i % 3 min 1)
    }.toDF("v", "y")
    def fit(df: org.apache.spark.sql.DataFrame) =
      TreeModel.treeFit(df, "v", "y", nFeatures = 3, bins = 8, lo = -1.0,
          hi = 1.0, depth = 2, minLeaf = 3)
        .orderBy("node_id").collect().map(_.toSeq).toSeq
    assert(fit(base.repartition(1)) == fit(base.repartition(7)))
  }
}
