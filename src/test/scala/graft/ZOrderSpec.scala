package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Morton coding + z-ordered clustering: literal curve values, plan
  * shape (one range exchange, helper column dropped), and the locality
  * payoff — each range partition covers a compact (x, y) rectangle. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue: literal Morton order on a 4x4 grid") {
    val got = (for (y <- 0 to 3; x <- 0 to 3) yield (x, y)).toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 2).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got((0, 0)) == 0L && got((1, 0)) == 1L && got((0, 1)) == 2L &&
      got((1, 1)) == 3L)
    assert(got((2, 0)) == 4L && got((0, 2)) == 8L && got((2, 2)) == 12L &&
      got((3, 3)) == 15L)
    assertThrows[IllegalArgumentException](ZOrder.zValue(col("x"), col("y"), 0))
  }

  test("clusterByZ: one range exchange on the z code; helper col dropped") {
    val df = Seq((1, 2, "a"), (3, 4, "b")).toDF("x", "y", "payload")
    val out = ZOrder.clusterByZ(df, "x", "y", bits = 4, numPartitions = Some(2))
    assert(out.columns.toSeq == Seq("x", "y", "payload"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.split("Exchange").length == 2, s"expected exactly one exchange: $plan")
  }

  test("z-ordered partitions cover compact rectangles in (x, y)") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
    val df = grid.toDF("x", "y").repartition(8)   // scrambled input
    val parts = ZOrder.clusterByZ(df, "x", "y", bits = 5, numPartitions = Some(4))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .collect()
    assert(parts.length == 4)
    // a z-range slice of a 32x32 grid is (about) a quadrant. Range
    // boundaries come from sampling, so a slice can straddle a quadrant
    // edge — assert the aggregate: total bounding-box area stays near the
    // perfect-quadrant 4x256=1024, far from the ~4x961 of a random
    // layout. This is exactly the parquet min/max pruning win.
    val area = parts.map { r =>
      (r.getInt(2) - r.getInt(1) + 1).toLong * (r.getInt(4) - r.getInt(3) + 1)
    }.sum
    assert(area <= 2560L, s"z-partition bounding boxes too loose: area $area")
    assert(parts.map(_.getLong(5)).sum == 1024L)
  }
}
