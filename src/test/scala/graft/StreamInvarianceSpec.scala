package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming half of the partition-invariance gate: every
  * `q_stream_*` query runs twice at sf0.001 under two sessions that
  * differ ONLY in the stateful-shuffle partitioning
  * (`graft.stream.statePartitions` 3 vs 8 — the knob
  * `GraftStreaming.runToMemory` snapshots into each stream), and the
  * drained sink tables must be bit-identical ([[Canon]] compare).
  *
  * This closes the gap [[InvarianceSpec]] leaves by excluding streams:
  * a state-store aggregate whose merge order leaked into a double
  * would pass every fixed-partitioning run and flip under the driver's.
  * All streaming state here is exact (longs / decimals / bounded
  * sketches with order-free merges), so the surface must hold
  * bit-equality across state partitionings.
  *
  * `SPARK_GRAFT_INVAR_ONLY=q_stream_a,...` restricts for iteration.
  */
class StreamInvarianceSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private lazy val sessions: Seq[(Int, SparkSession)] = Seq(3, 8).map { p =>
    val s = TestSpark.spark.newSession()
    s.conf.set("graft.stream.statePartitions", p.toString)
    (p, s)
  }

  private val streams = SparkEntry.queries.keys.toSeq.sorted
    .filter(_.startsWith("q_stream_"))

  private val only = sys.env.get("SPARK_GRAFT_INVAR_ONLY")
    .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

  for (name <- streams if only.forall(_.contains(name)))
    test(s"state-partition-invariant: $name") {
      val fn = SparkEntry.queries(name)
      val Seq((pa, sa), (pb, sb)) = sessions
      val a = Canon.canon(fn(sa, dir))
      val b = Canon.canon(fn(sb, dir))
      if (a != b) {
        val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
        fail(s"$name diverges between statePartitions=$pa and $pb " +
          s"(${a.size} vs ${b.size} rows; first differing row index " +
          s"$firstDiff:\n  $pa: ${a.lift(firstDiff).getOrElse("<none>")}" +
          s"\n  $pb: ${b.lift(firstDiff).getOrElse("<none>")})")
      }
    }
}
