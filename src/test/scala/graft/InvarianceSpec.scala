package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
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
  // ONLY delta is the shuffle partitioning, so any result difference is
  // a partition-order / association-order dependence in the plan.
  private lazy val sessions: Seq[(Int, SparkSession)] = Seq(3, 32).map { p =>
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", p.toString)
    (p, s)
  }

  /** Canonical, bit-exact rendering: doubles/floats by their IEEE bits
    * (NaN canonicalized by to*Bits), maps sorted by rendered key,
    * arrays/structs positionally, null distinguished from "null". */
  private def render(v: Any): String = v match {
    case null => "∅"
    case d: java.lang.Double => "d" + java.lang.Double.doubleToLongBits(d)
    case f: java.lang.Float => "f" + java.lang.Float.floatToIntBits(f)
    case r: Row => r.toSeq.map(render).mkString("(", ",", ")")
    case m: scala.collection.Map[_, _] =>
      m.iterator.map { case (k, x) => render(k) + "→" + render(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.map(render).mkString("[", ",", "]")
    case a: Array[_] => a.iterator.map(render).mkString("[", ",", "]")
    case x => x.toString
  }

  /** Sorted-multiset canonical form of a result, columns sorted by name
    * (mirrors the driver's compare). */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq.map(col)
    df.select(cols: _*).collect()
      .map(r => r.toSeq.map(render).mkString("|")).toSeq.sorted
  }

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
