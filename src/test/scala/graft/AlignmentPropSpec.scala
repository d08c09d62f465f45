package graft

import graft.api.Series
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based alignment algebra (SURVEY.md §5 item 4): the result
  * index of an aligned binary op is the outer join of the operand indexes;
  * addition commutes on the value level; fill_value coalesces exactly the
  * one-sided rows. Uses raw ScalaCheck generators with a fixed seed
  * (scalatestplus bridge is not in the offline cache); small case count —
  * each case is a Spark round trip. */
class AlignmentPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val items: Gen[List[(Int, Double)]] = for {
    keys <- Gen.someOf(0 to 7)
    vals <- Gen.listOfN(keys.size, Gen.choose(-100.0, 100.0))
  } yield keys.toList.zip(vals)

  def cases(n: Int): Seq[(List[(Int, Double)], List[(Int, Double)])] =
    (0 until n).flatMap { i =>
      for {
        a <- items.apply(Gen.Parameters.default, Seed(42L + i))
        b <- items.apply(Gen.Parameters.default, Seed(1042L + i))
        if a.nonEmpty && b.nonEmpty
      } yield (a, b)
    }

  test("aligned add: index = union of indexes; non-overlap → null; commutes") {
    cases(8).foreach { case (a, b) =>
      val sa = Series.fromLocal(spark, a)
      val sb = Series.fromLocal(spark, b)
      val got = sa.add(sb).collectItems().toMap
      assert(got.keySet == (a.map(_._1) ++ b.map(_._1)).toSet.asInstanceOf[Set[Any]])
      val am = a.toMap; val bm = b.toMap
      got.foreach { case (k, v) =>
        val key = k.asInstanceOf[Int]
        (am.get(key), bm.get(key)) match {
          case (Some(x), Some(y)) =>
            assert(math.abs(v.asInstanceOf[Double] - (x + y)) < 1e-9)
          case _ => assert(v == null)
        }
      }
      val rev = sb.add(sa).collectItems().toMap
      assert(rev.keySet == got.keySet)
      got.foreach { case (k, v) =>
        if (v == null) assert(rev(k) == null)
        else assert(math.abs(rev(k).asInstanceOf[Double] - v.asInstanceOf[Double]) < 1e-9)
      }
    }
  }

  test("fill_value coalesces exactly the one-sided rows") {
    cases(8).foreach { case (a, b) =>
      val sa = Series.fromLocal(spark, a)
      val sb = Series.fromLocal(spark, b)
      val filled = sa.add(sb, fillValue = Some(0.0)).collectItems().toMap
      val am = a.toMap; val bm = b.toMap
      filled.foreach { case (k, v) =>
        val key = k.asInstanceOf[Int]
        val exp = (am.get(key), bm.get(key)) match {
          case (Some(x), Some(y)) => x + y
          case _ => 0.0 // post-op coalesce (alchemy.py:178-181)
        }
        assert(math.abs(v.asInstanceOf[Double] - exp) < 1e-9)
      }
    }
  }
}
