package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plan-snapshot regression gate: recompute the structural digest of
  * each tracked expensive query and diff against the committed
  * `tools/plan_digests.txt`. A failure here means the PHYSICAL PLAN
  * changed — an added exchange, a join strategy flip, a lost pushdown —
  * which at 100 TB is a production incident even when the answer is
  * still correct. If the change is intentional, regenerate the snapshot
  * (`sbt "runMain graft.tools.PlanDigest"`) and commit the diff. */
class PlanSnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("expensive-query plan digests match the committed snapshot") {
    val path = java.nio.file.Paths.get(graft.tools.PlanDigest.SnapshotPath)
    assert(java.nio.file.Files.exists(path),
      s"missing committed snapshot ${graft.tools.PlanDigest.SnapshotPath} — " +
        "generate it with: sbt \"runMain graft.tools.PlanDigest\"")
    val committed = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(path)).asScala
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map(graft.tools.PlanDigest.parse).toMap
    assert(committed.keySet == graft.tools.PlanDigest.Tracked.toSet,
      "snapshot/tracked-query drift — regenerate the snapshot")
    val diffs = graft.tools.PlanDigest.Tracked.flatMap { name =>
      val got = graft.tools.PlanDigest.digestFor(
        spark, name, graft.tools.PlanDigest.DefaultSfDir)
      val want = committed(name)
      if (got == want) None
      else Some(s"$name:\n  committed: ${graft.tools.PlanDigest.render(name, want)}\n" +
        s"  actual:    ${graft.tools.PlanDigest.render(name, got)}")
    }
    assert(diffs.isEmpty,
      "physical plans drifted from the committed snapshot (intentional? " +
        "regenerate via sbt \"runMain graft.tools.PlanDigest\" and review " +
        "the git diff):\n" + diffs.mkString("\n"))
  }
}
