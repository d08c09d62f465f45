package graft

import graft.functions.CountMin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count–Min sketch: exactness on sparse keys, the one-sided guarantee
  * and width bound on real data, merge/partition invariance, validation. */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("count_min: point estimates exact when width >> keys; absent keys floor at 0") {
    val df = Seq("x", "x", "x", "y", "z", "z").toDF("w")
    val sk = df.agg(CountMin(col("w"), width = 4096, depth = 4).as("sk"))
    val est = sk.select(
        CountMin.estimate(col("sk"), lit("x"), 4096, 4).as("x"),
        CountMin.estimate(col("sk"), lit("y"), 4096, 4).as("y"),
        CountMin.estimate(col("sk"), lit("z"), 4096, 4).as("z"),
        CountMin.estimate(col("sk"), lit("absent"), 4096, 4).as("a"))
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(est == ((3L, 1L, 2L, 0L)))
  }

  test("count_min: sketch cells bit-identical across partitionings (merge = cell sum)") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").cast("string").as("u"))
    def cells(parts: Int): Seq[Long] = ev.repartition(parts)
      .agg(CountMin(col("u"), 512, 3).as("sk"))
      .as[Seq[Long]].collect()(0)
    assert(cells(1) == cells(7))
  }

  test("count_min: one-sided guarantee + width bound hold for every key on real data") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").cast("string").as("u"))
    val n = ev.count()
    val sk = ev.agg(CountMin(col("u")).as("sk"))
    val bad = ev.groupBy("u").agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(sk))
      .select(col("u"), col("n_exact"),
        CountMin.estimate(col("sk"), col("u")).as("est"))
      .where(col("est") < col("n_exact") ||
        col("est") > col("n_exact") + lit(math.ceil(4.0 * n / CountMin.DefaultWidth).toLong))
      .count()
    assert(bad == 0L)
  }

  test("count_min: validation (positive dims, string input, sketch size probe)") {
    assert(new graft.functions.CMSketch(64, 4).estimate("k") == 0L)
    val df = Seq(1, 2).toDF("i")
    val e = intercept[Exception] {
      df.agg(CountMin(col("i")).as("sk")).collect()
    }
    assert(e.getMessage.contains("string item column") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
    val sk = Seq("x").toDF("w").agg(CountMin(col("w"), 64, 2).as("sk"))
    val e2 = intercept[Exception] {
      sk.select(CountMin.estimate(col("sk"), lit("x"), 64, 4)).collect()
    }
    assert(e2.getMessage.contains("elements") || e2.getMessage.contains("64 x 4"))
    // TRANSPOSED dims multiply to the same cell count — the header must
    // reject them instead of returning silent garbage
    val e3 = intercept[Exception] {
      sk.select(CountMin.estimate(col("sk"), lit("x"), 32, 4)).collect()
    }
    assert(e3.getMessage.contains("built as 64 x 2"))
  }
}
