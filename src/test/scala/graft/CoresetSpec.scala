package graft

import graft.operators.Coreset
import org.scalatest.funsuite.AnyFunSuite

/** Greedy k-center: the farthest-point traversal is hand-traceable on a
  * 1-D layout, ties break to the smallest id, and the selection must be
  * invariant to input partitioning (integer-quantized distances). */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kCenter: hand-traced 1-D traversal with a tie") {
    // seed = id 1 (x=0); farthest is id 4 (x=10, d2q=100e9); then ids 2
    // (x=4, d2=16) and 3 (x=6, d2=16) TIE at distance 16 to their
    // nearest center — smallest id 2 wins round 2
    val pts = Seq((1L, Array(0.0f)), (2L, Array(4.0f)),
      (3L, Array(6.0f)), (4L, Array(10.0f))).toDF("id", "v")
    val r = Coreset.kCenter(pts, "id", "v", k = 3)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((0, 1L, 0L), (1, 4L, 100000000000L),
      (2, 2L, 16000000000L)))
  }

  test("kCenter: selection invariant to input partitioning") {
    val base = Seq.tabulate(100)(i => (i.toLong,
      Array(math.sin(i * 1.9).toFloat, math.cos(i * 0.8).toFloat,
        math.sin(i * 3.1).toFloat)))
      .toDF("id", "v")
    def sel(df: org.apache.spark.sql.DataFrame) =
      Coreset.kCenter(df, "id", "v", k = 6)
        .collect().map(_.toSeq).toSeq
    assert(sel(base.repartition(1)) == sel(base.repartition(11)))
  }
}
