package graft

import graft.api.{DataFrame, Series}
import org.scalatest.funsuite.AnyFunSuite

/** Iteration / fetch surface (SURVEY.md §2.9). */
class IterationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("iterrows yields (index, values) in frame order") {
    val df = DataFrame.fromLocal(spark, Seq("a", "b"),
      Seq(Seq[Any](1, "x"), Seq[Any](2, "y")))
    val rows = df.iterrows().toSeq
    assert(rows.map(_._1) == Seq(0L, 1L))
    assert(rows.map(_._2) == Seq(Seq(1, "x"), Seq(2, "y")))
  }

  test("itertuples with and without index + rename fields") {
    val df = DataFrame.fromLocal(spark, Seq("a", "b"),
      Seq(Seq[Any](1, "x"), Seq[Any](2, "y")))
    val (names, it) = df.itertuples()
    assert(names == Seq("Index", "a", "b"))
    assert(it.next() == Seq(0L, 1, "x"))
    val (names2, it2) = df.itertuples(index = false)
    assert(names2 == Seq("a", "b"))
    assert(it2.toSeq == Seq(Seq(1, "x"), Seq(2, "y")))
  }

  test("items yields per-column Series without fetching") {
    val df = DataFrame.fromLocal(spark, Seq("a", "b"),
      Seq(Seq[Any](1, 10.0), Seq[Any](2, 20.0)))
    val cols = df.items
    assert(cols.map(_._1) == Seq(Some("a"), Some("b")))
    assert(cols(1)._2.values == Seq(10.0, 20.0))
  }

  test("Series iterator + indexValues") {
    val s = Series.fromList(spark, Seq(5, 6, 7))
    assert(s.iterator.toSeq == Seq(5, 6, 7))
    assert(s.indexValues.map(_.head) == Seq(0L, 1L, 2L))
  }
}
