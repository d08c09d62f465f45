package graft

import graft.operators.Density
import org.scalatest.funsuite.AnyFunSuite

/** Epsilon-grid DBSCAN: hand-computable roles on a planted layout, the
  * inclusive eps boundary ACROSS a grid-cell border (the case a wrong
  * neighborhood replication silently drops), and a brute-force
  * differential on pseudo-random points. */
class DensitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dbscanRoles: planted core/border/noise layout") {
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.0, 0.9), (3L, 0.0, 1.8), // chain: 2 is core
      (4L, 5.0, 5.0), (5L, 5.0, 5.9),                 // lonely pair
      (6L, 10.0, 10.0)                                // isolated
    ).toDF("id", "x", "y")
    val r = Density.dbscanRoles(pts, "id", "x", "y", eps = 1.0, minPts = 3L)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2)))
      .toMap
    assert(r == Map(
      1L -> (2L, "border"), 2L -> (3L, "core"), 3L -> (2L, "border"),
      4L -> (2L, "noise"), 5L -> (2L, "noise"), 6L -> (1L, "noise")))
  }

  test("dbscanRoles: exact-eps pair across a cell border is kept") {
    val pts = Seq((1L, 0.95, 0.0), (2L, 1.95, 0.0)).toDF("id", "x", "y")
    val r = Density.dbscanRoles(pts, "id", "x", "y", eps = 1.0, minPts = 2L)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2)))
      .toMap
    assert(r == Map(1L -> (2L, "core"), 2L -> (2L, "core")))
  }

  test("dbscanRoles: grid join equals brute force on random points") {
    val n = 80
    val raw = Seq.tabulate(n)(i =>
      (i.toLong, math.sin(i * 1.7) * 2.0, math.cos(i * 2.3) * 2.0))
    val eps = 0.6; val minPts = 4L
    val grid = Density.dbscanRoles(raw.toDF("id", "x", "y"), "id", "x",
        "y", eps, minPts)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2)))
      .toMap
    // brute force in Scala with the same inclusive eps^2 rule
    val cnt = raw.map { case (i, x, y) =>
      i -> raw.count { case (_, u, v) =>
        (x - u) * (x - u) + (y - v) * (y - v) <= eps * eps }.toLong
    }.toMap
    val expected = raw.map { case (i, x, y) =>
      val core = cnt(i) >= minPts
      val hasCoreNbr = raw.exists { case (j, u, v) =>
        (x - u) * (x - u) + (y - v) * (y - v) <= eps * eps &&
          cnt(j) >= minPts }
      i -> (cnt(i),
        if (core) "core" else if (hasCoreNbr) "border" else "noise")
    }.toMap
    assert(grid == expected)
  }
}
