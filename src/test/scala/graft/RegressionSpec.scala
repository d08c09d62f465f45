package graft

import graft.operators.{Regression, Similarity, TextAnalysis, UrlOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-group OLS: literal fits, degenerate-group NULLs — plus
  * partition-invariance pins for every session-5 operator whose
  * determinism contract is "same result under ANY partitioning". */
class RegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groupLinearFit: exact fit on collinear data, r2 = 1") {
    // y = 3x + 2 exactly within group a; group b constant-x (degenerate)
    val df = (Seq(("a", 1.0, 5.0), ("a", 2.0, 8.0), ("a", 3.0, 11.0),
      ("b", 7.0, 1.0), ("b", 7.0, 9.0))).toDF("g", "x", "y")
    val rows = Regression.groupLinearFit(df, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
    val a = rows(0)
    assert(a.getLong(1) == 3L)
    assert(math.abs(a.getDouble(2) - 3.0) < 1e-12)   // slope
    assert(math.abs(a.getDouble(3) - 2.0) < 1e-12)   // intercept
    assert(math.abs(a.getDouble(4) - 1.0) < 1e-12)   // r2
    val b = rows(1)                                   // constant x → NULLs
    assert(b.isNullAt(2) && b.isNullAt(3) && b.isNullAt(4))
  }

  test("groupLinearFit: constant y gives slope 0 and NULL r2") {
    val df = Seq(("a", 1.0, 4.0), ("a", 2.0, 4.0), ("a", 3.0, 4.0)).toDF("g", "x", "y")
    val r = Regression.groupLinearFit(df, Seq("g"), col("x"), col("y")).collect()(0)
    assert(r.getDouble(2) == 0.0 && r.isNullAt(4))
  }

  test("session-5 operators are partition-invariant (bit-equal results)") {
    val docs = (1 to 200).map(i => (i.toLong, s"w$i common t${i % 9} the")).toDF("doc_id", "text")
    val emb = (1 to 100).map(i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11 - 5).toFloat))).toDF("vec_id", "v")
    def collectStr(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    for (parts <- Seq(1, 7)) {
      val d = docs.repartition(parts)
      val e = emb.repartition(parts)
      assert(collectStr(TextAnalysis.bpeTopPairs(d, "text", 10)) ==
        collectStr(TextAnalysis.bpeTopPairs(docs, "text", 10)))
      assert(collectStr(Similarity.dimStats(e, "v")) ==
        collectStr(Similarity.dimStats(emb, "v")))
      assert(collectStr(Similarity.powerIteration(e, "vec_id", "v", dim = 4, iters = 2)) ==
        collectStr(Similarity.powerIteration(emb, "vec_id", "v", dim = 4, iters = 2)))
      val urls = docs.select(col("doc_id"),
        concat(lit("https://s"), pmod(col("doc_id"), lit(13)).cast("string"),
          lit(".example.com/p")).as("url"))
      assert(collectStr(UrlOps.perDomainCap(urls.repartition(parts), "url", "doc_id", 3)) ==
        collectStr(UrlOps.perDomainCap(urls, "url", "doc_id", 3)))
      assert(collectStr(Regression.groupLinearFit(
          d.withColumn("y", col("doc_id") * 2 + 1), Seq("text"),
          col("doc_id"), col("y"))) ==
        collectStr(Regression.groupLinearFit(
          docs.withColumn("y", col("doc_id") * 2 + 1), Seq("text"),
          col("doc_id"), col("y"))))
    }
  }
}
