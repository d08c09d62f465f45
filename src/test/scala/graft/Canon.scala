package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** Canonical bit-exact result rendering shared by the invariance gates
  * ([[InvarianceSpec]], [[StreamInvarianceSpec]]): sorted-multiset row
  * form, columns sorted by name (mirroring the driver's compare),
  * doubles/floats by IEEE bits so a low-decimal flip can never hide
  * behind string formatting. */
object Canon {
  def render(v: Any): String = v match {
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

  def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq.map(col)
    df.select(cols: _*).collect()
      .map(r => r.toSeq.map(render).mkString("|")).toSeq.sorted
  }
}
