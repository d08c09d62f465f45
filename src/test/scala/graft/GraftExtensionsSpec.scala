package graft

import org.apache.spark.sql.GraftSqlBridge
import org.scalatest.funsuite.AnyFunSuite

/** `graft.GraftExtensions` (`spark.sql.extensions=graft.GraftExtensions`)
  * must register the complete graft_* SQL surface through Spark's own
  * injection machinery — driven here via the `registerFunctions` bridge
  * rather than a second SparkContext. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("GraftExtensions injects every graft_* function; builders validate as in register()") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftSqlBridge.applyFunctionInjections(ext, spark)
    // scalar functions all resolve and compute
    val r = spark.sql(
      """SELECT graft_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c,
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  graft_normalize_ws('  A  b ') AS n,
        |  graft_unicode_normalize('café') AS u,
        |  graft_shingles('a b c', 2) AS s""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    assert(r.getString(2) == "a b")
    assert(r.getString(3) == "café")
    assert(r.getSeq[String](4) == Seq("a b", "b c"))
    // aggregates resolve and compute
    val hh = spark.sql(
      "SELECT graft_frequent_items(w, 8, 1) AS f FROM VALUES ('x'), ('x'), ('y') AS t(w)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(hh.map(x => (x.getString(0), x.getLong(1))) == Seq(("x", 2L)))
    val tk = spark.sql(
      """SELECT graft_top_k(CAST(v AS DOUBLE), CAST(id AS BIGINT), 2) AS t
        |FROM VALUES (3.0, 1), (1.0, 2), (2.0, 3) AS t(v, id)""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(x => (x.getDouble(0), x.getLong(1))) == Seq((3.0, 1L), (2.0, 3L)))
    val cm = spark.sql(
      """SELECT graft_cm_estimate(
        |  graft_count_min(w, 64, 4), 'x', 64, 4) AS est
        |FROM VALUES ('x'), ('x'), ('y') AS t(w)""".stripMargin)
      .collect()(0).getLong(0)
    assert(cm == 2L)
    // the injected builders carry the same validation as register()
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_frequent_items(w, w, 2) FROM VALUES ('x') AS t(w)").collect()
    }
    assert(e.getMessage.contains("capacity") || e.getMessage.contains("NON_FOLDABLE"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_top_k(CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT))").collect()
    }
    assert(e2.getMessage.contains("3 arguments"))
    // DESCRIBE FUNCTION surfaces the usage string
    val desc = spark.sql("DESCRIBE FUNCTION graft_frequent_items")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("graft_frequent_items"))
    // the injection table covers every registered native function
    assert(GraftExtensions.all.map(_._1).sorted == Seq(
      "graft_cm_estimate", "graft_cosine", "graft_count_min", "graft_dot",
      "graft_frequent_items", "graft_jaro", "graft_jaro_winkler",
      "graft_luhn", "graft_normalize_ws", "graft_shingles", "graft_top_k",
      "graft_unicode_normalize"))
  }
}
