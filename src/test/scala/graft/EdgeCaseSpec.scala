package graft

import graft.api.{DataFrame, Frames, Series}
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate inputs: empty frames, all-null columns, single rows —
  * the shapes that appear constantly as partition-local slices at scale
  * (an executor's slice of a 100 TB table is routinely empty). */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def emptyDf: DataFrame =
    DataFrame.fromLocal(spark, Seq("a", "b"), Nil)

  test("empty frame: shape, head/tail, reductions") {
    val d = emptyDf
    assert(d.len == 0 && d.shape(0) == 0 && d.shape(1) == 2)
    assert(d.head(5).len == 0 && d.tail(5).len == 0)
    assert(d.dropDuplicates().len == 0)
    val s = d.sum() // column-axis reduction over zero rows
    assert(s.collectItems().map(_._2).forall(v => v == null || v == 0))
  }

  test("empty series: quantile NaN, nlargest empty, valueCounts empty") {
    val s = Series.fromList(spark, Seq.empty[Double])
    assert(s.quantile(0.5).isNaN)
    assert(s.nlargest(3).len == 0)
    assert(s.valueCounts().len == 0)
    assert(s.countNonNull() == 0 && s.nunique() == 0)
  }

  test("null-heavy column: reductions and masks behave") {
    val d = DataFrame.fromLocal(spark, Seq("v"),
      Seq(Seq[Any](null), Seq[Any](2.0), Seq[Any](null)))
    val s = d("v")
    assert(s.countNonNull() == 1)
    assert(s.dropna().len == 1)
    assert(d.dropna().len == 1)
    assert(d.fillna(7).toSpark().collect().forall(r => !r.isNullAt(0)))
  }

  test("single row: window-free ops stay sane") {
    val d = DataFrame.fromLocal(spark, Seq("k", "v"), Seq(Seq[Any]("x", 1.0)))
    assert(d.duplicated().values == Seq(false))
    val t = d.groupby(Seq("k")).transform("v", "sum", "s")
    assert(t.toSpark().collect()(0).getDouble(2) == 1.0)
    assert(d("v").quantile(0.5) == 1.0)
  }

  test("concat of empty with non-empty keeps the non-empty rows") {
    val e = emptyDf
    val d = DataFrame.fromLocal(spark, Seq("a", "b"),
      Seq(Seq[Any](1.0, 2.0)))
    assert(Frames.concat(Seq(e, d)).len == 1)
  }

  test("qcut on a constant column collapses to the lowest bin") {
    val s = Series.fromList(spark, Seq(5.0, 5.0, 5.0))
    assert(s.qcut(3).values.toSet == Set("q1"))
  }

  test("round-3 operators on degenerate inputs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // zscore: single-row group (n−1 = 0) AND constant group (variance
    // 0, which would be 0/0 = NaN) → explicit NULL guard, never NaN/Inf
    val one = Seq(("a", 5.0)).toDF("k", "v")
    val z = graft.operators.WindowOps.zscore(one, Seq("k"), "v")
      .select("z").collect()(0)
    assert(z.isNullAt(0))
    val const = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0)).toDF("k", "v")
    val zc = graft.operators.WindowOps.zscore(const, Seq("k"), "v")
      .select("z").collect()
    assert(zc.forall(_.isNullAt(0)))
    // budgetSample: zero-token docs cost nothing and survive the cut
    val zt = Seq(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 10L))
      .toDF("lang", "doc_id", "n_tokens")
    assert(graft.operators.Sampling.budgetSample(zt, "lang", "doc_id",
      "n_tokens", 5L).count() == 3)
    // packSequences/chunkTokens: empty frames flow through
    val empty = Seq.empty[(String, Long, Long)].toDF("lang", "doc_id", "n_tokens")
    assert(graft.operators.ShardPack.packSequences(empty, "lang", "doc_id",
      "n_tokens", 100L).count() == 0)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.TextAnalysis.chunkTokens(noDocs, "doc_id", "text",
      8, 2).count() == 0)
    // novelAgainst: empty corpus → whole batch is novel
    val batch = Seq((1L, "hello world")).toDF("doc_id", "text")
    assert(graft.operators.Dedup.novelAgainst(batch, noDocs, "text")
      .count() == 1)
  }

  test("empty dedup/cluster inputs produce empty outputs") {
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.operators.Dedup.duplicateClusters(noPairs, "id_a", "id_b").count() == 0)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Dedup.exactText(noDocs, "text", "doc_id").count() == 0)
    assert(graft.operators.TextAnalysis.tfidf(noDocs, "doc_id", "text", 0).count() == 0)
  }

  test("session-4 operators on degenerate inputs") {
    import graft.operators.{Dedup, Profile, WindowOps}
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val noEv = Seq.empty[(Long, Long, Double, String)].toDF("k", "t", "v", "e")
    // attribution: no rows, and rows with zero conversions -> empty
    assert(WindowOps.attribution(noEv, Seq("k"), Seq("t"), "e", "buy")
      .count() == 0)
    val noConv = Seq((1L, 1L, 0.0, "view"), (1L, 2L, 0.0, "click"))
      .toDF("k", "t", "v", "e")
    assert(WindowOps.attribution(noConv, Seq("k"), Seq("t"), "e", "buy")
      .count() == 0)
    // conversion with no preceding touches credits nothing
    val bare = Seq((1L, 1L, 0.0, "buy")).toDF("k", "t", "v", "e")
    assert(WindowOps.attribution(bare, Seq("k"), Seq("t"), "e", "buy")
      .count() == 0)
    // kaplanMeier: empty input and all-censored cohorts emit no rows
    assert(WindowOps.kaplanMeier(
      Seq.empty[(Long, Int)].toDF("d", "ev"), "d", "ev").count() == 0)
    assert(WindowOps.kaplanMeier(
      Seq((3L, 0), (5L, 0)).toDF("d", "ev"), "d", "ev").count() == 0)
    // resample: empty input -> no bars; single row -> open=close=high=low
    assert(WindowOps.resampleOhlc(noEv, Seq("e"), "t", "v", 10L).count() == 0)
    val one = WindowOps.resampleOhlc(
      Seq(("x", 7L, 42.5)).toDF("e", "t", "v"), Seq("e"), "t", "v", 10L)
      .collect()(0)
    assert(one.getDouble(3) == 42.5 && one.getDouble(4) == 42.5 &&
      one.getDouble(5) == 42.5 && one.getDouble(6) == 42.5)
    // functionalDeps: empty table -> zero groups, dependency holds
    val fd = Profile.functionalDeps(noEv, Seq(("k", "e"))).collect()(0)
    assert(fd.getLong(2) == 0L && fd.getBoolean(5))
    // fuzzyLinkage: empty and all-null-block inputs emit no pairs
    val noNames = Seq.empty[(Long, String)].toDF("id", "nm")
    assert(Dedup.fuzzyLinkage(noNames, "id", "nm", col("nm")).count() == 0)
    val nullBlk = Seq((1L, "a"), (2L, "b")).toDF("id", "nm")
    assert(Dedup.fuzzyLinkage(nullBlk, "id", "nm",
      lit(null).cast("string")).count() == 0)
    // calibration: empty input -> no bins (no divide-by-zero row)
    assert(Profile.calibrationReport(
      Seq.empty[(Double, Boolean)].toDF("score", "label"),
      "score", "label").count() == 0)
  }

  test("session-5 operators on degenerate inputs") {
    import graft.operators.{Dedup, GraphOps, Profile, Similarity, TextAnalysis, WindowOps}
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val noEv = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")
    // cusum / rollingCorr: empty in, empty out; single row behaves
    assert(WindowOps.cusum(noEv, Seq("k"), Seq("t"), "v", 1.0, 0.1, 5.0)
      .count() == 0)
    val oneRow = WindowOps.cusum(Seq((1L, 1L, 10.0)).toDF("k", "t", "v"),
      Seq("k"), Seq("t"), "v", 1.0, 0.1, 5.0).collect()(0)
    assert(oneRow.getAs[Boolean]("alarm"))
    assert(WindowOps.rollingCorr(noEv.withColumn("y", col("v")),
      Seq("k"), Seq("t"), "v", "y", 3).count() == 0)
    // applyChangelog: empty log -> empty snapshot; all-delete log too
    val noLog = Seq.empty[(Long, Long, Double, String)]
      .toDF("id", "ver", "v", "op")
    assert(Dedup.applyChangelog(noLog, Seq("id"), Seq("ver"), "op")
      .count() == 0)
    val allDel = Seq((1L, 1L, 0.0, "D"), (2L, 1L, 0.0, "D"))
      .toDF("id", "ver", "v", "op")
    assert(Dedup.applyChangelog(allDel, Seq("id"), Seq("ver"), "op")
      .count() == 0)
    // gainsTable: empty input -> no bands (percentile of nothing)
    assert(Profile.gainsTable(
      Seq.empty[(Double, Boolean)].toDF("score", "label"), "score", "label",
      buckets = 4).count() == 0)
    // piiReport: empty text and null text count zero, never throw
    val rep = TextAnalysis.piiReport(
      Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(rep(0).getInt(1) == 0 && rep(0).getInt(4) == 0)
    assert(rep(1).isNullAt(1), "null text propagates NULL counts")
    // crossSpans: empty eval set -> no spans; doc shorter than minTokens
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.crossSpans(docs, "doc_id", "text",
      Seq.empty[(Long, String)].toDF("eval_id", "text"), "eval_id", "text",
      minTokens = 8).count() == 0)
    // coVisitationLift: a single-item key yields no pairs
    assert(GraphOps.coVisitationLift(
      Seq((1L, "only")).toDF("k", "item"), "k", "item", 10).count() == 0)
    // profileDrift vs an EMPTY new snapshot: rows drop to 0, null-rate
    // delta NULL-safe (0/0 -> NaN is a double; range drift flags)
    val old = Seq((1L, "x")).toDF("a", "b")
    val drift = Profile.profileDrift(old, old.limit(0), Seq("a"))
      .collect()(0)
    assert(drift.getAs[Long]("new_rows") == 0L)
    assert(drift.getAs[Boolean]("range_drifted"),
      "empty side must flag the envelope change")
    // embeddingDrift on an empty side: dim join drops to zero rows
    assert(Similarity.embeddingDrift(
      Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding"),
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      "embedding").count() == 0)
  }
}
