package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Partition-invariance gate over the ENTIRE batch query surface.
  *
  * Every `SparkEntry.queries` entry (streaming excluded — those run
  * micro-batch harnesses whose determinism is pinned by the per-op
  * stream≡batch parity specs) is executed twice at sf0.001 under two
  * sessions that differ ONLY in `spark.sql.shuffle.partitions` (3 vs
  * 32), and the full result sets must be BIT-identical (doubles compared
  * via `doubleToLongBits`, not string rendering).
  *
  * This is the gate that kills the q_transition_entropy failure class
  * permanently: an unquantized floating-point aggregate whose
  * association order depends on the physical partitioning passes every
  * fixed-partitioning oracle run and then flips a low decimal under the
  * driver's partitioning. Any such site now fails HERE, deterministically,
  * at test time. (Same rationale as the driver hash gate: rows are
  * compared as sorted multisets, columns sorted by name.)
  *
  * `SPARK_GRAFT_INVAR_ONLY=q_a,q_b` restricts the sweep for local
  * iteration; unset runs the full surface.
  */
class InvarianceSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  // Two isolated-SQLConf sessions over the one shared SparkContext: the
  // deltas are the shuffle partitioning AND the scan-split sizing (the
  // second session forces many tiny input splits, perturbing map-side
  // partial-aggregate association order too), so any result difference
  // is a partition-order / association-order dependence in the plan.
  private lazy val sessions: Seq[(Int, SparkSession)] = {
    val a = TestSpark.spark.newSession()
    a.conf.set("spark.sql.shuffle.partitions", "3")
    val b = TestSpark.spark.newSession()
    b.conf.set("spark.sql.shuffle.partitions", "32")
    b.conf.set("spark.sql.files.maxPartitionBytes", "262144") // 256 KB
    b.conf.set("spark.sql.files.openCostInBytes", "0")
    Seq((3, a), (32, b))
  }

  import Canon.canon

  private val batch = SparkEntry.queries.keys.toSeq.sorted
    .filterNot(_.startsWith("q_stream_"))

  private val only = sys.env.get("SPARK_GRAFT_INVAR_ONLY")
    .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

  for (name <- batch if only.forall(_.contains(name)))
    test(s"partition-invariant: $name") {
      val fn = SparkEntry.queries(name)
      val Seq((pa, sa), (pb, sb)) = sessions
      val a = canon(fn(sa, dir))
      val b = canon(fn(sb, dir))
      if (a != b) {
        val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
        fail(s"$name diverges between shuffle.partitions=$pa and $pb " +
          s"(${a.size} vs ${b.size} rows; first differing row index " +
          s"$firstDiff:\n  $pa: ${a.lift(firstDiff).getOrElse("<none>")}" +
          s"\n  $pb: ${b.lift(firstDiff).getOrElse("<none>")})")
      }
    }
}
