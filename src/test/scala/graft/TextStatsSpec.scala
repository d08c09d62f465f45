package graft

import graft.operators.{Profile, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 text/stat additions: readability counts are hand-checkable,
  * fertility ratios divide exact sums, n-gram diversity counts sliding
  * windows exactly, and Welch's t reproduces the closed-form on a tiny
  * two-group layout. */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readability: hand-counted words/sentences/syllables") {
    val docs = Seq(
      (1L, "the cat sat. it sat again!"),  // 6 words, 2 sents
      (2L, ""),                            // drops (0 words)
      (3L, "no stops here")                // sentences floor at 1
    ).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // doc 1 vowel groups: e,a,a,i,a,a,ai -> 7
    assert(r == Map(1L -> (6L, 2L, 7L), 3L -> (3L, 1L, 4L)))
    val flesch = TextAnalysis.readability(docs, "doc_id", "text")
      .where($"doc_id" === 1).collect()(0).getDouble(4)
    assert(math.abs(flesch -
      (206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0))) < 1e-12)
  }

  test("fertilityByLang: exact sums and ratios") {
    val docs = Seq(("en", "ab cd"), ("en", "xyz"), ("de", "üü"))
      .toDF("lang", "text")
    val r = TextAnalysis.fertilityByLang(docs, "lang", "text")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getDouble(5), x.getDouble(6))).toMap
    // en: 3 tokens, 8 chars, 8 bytes; de: 1 token, 2 chars, 4 bytes (ü=2)
    assert(r("en") == ((2L, 3L, 8L, 8L, 8.0 / 3.0, 1.0)))
    assert(r("de") == ((1L, 1L, 2L, 4L, 2.0, 2.0)))
  }

  test("ngramDiversity: sliding trigrams with a repeat") {
    val docs = Seq(("s1", "a b c a b c a"), ("s2", "x y"))
      .toDF("source", "text")
    val r = TextAnalysis.ngramDiversity(docs, "source", "text", n = 3)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    // s1 trigrams: abc bca cab abc bca -> 5 total, 3 distinct
    assert(r == Map("s1" -> (5L, 3L, 0.6))) // s2 too short, drops
  }

  test("welchTTest: closed-form on a two-group layout") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0)).toDF("g", "v")
    val r = Profile.welchTTest(df, "g", "v").collect()(0)
    assert((r.getString(0), r.getString(1)) == ("a", "b"))
    assert((r.getLong(2), r.getLong(3)) == ((3L, 2L)))
    // means 2 and 3; s2a = 1, s2b = 2; se2 = 1/3 + 1 = 4/3
    assert(math.abs(r.getDouble(4) - (-1.0)) < 1e-9)
    assert(math.abs(r.getDouble(5) - (-1.0 / math.sqrt(4.0 / 3.0))) < 1e-9)
    val va = 1.0 / 3.0; val vb = 1.0
    val dfExp = (va + vb) * (va + vb) / (va * va / 2.0 + vb * vb / 1.0)
    assert(math.abs(r.getDouble(6) - dfExp) < 1e-9)
  }

  test("mannWhitneyBinned: closed-form without and with ties") {
    import graft.operators.Profile
    // no ties: a={1,2}, b={3,4} in unit bins -> U_a=0, U_b=4,
    // var = (2*2/12)*(N+1) = 5/3
    val df1 = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r1 = Profile.mannWhitneyBinned(df1, "g", "v", 0.0, 5.0, 5)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r1("a")._2 == 0.0 && r1("b")._2 == 4.0)
    assert(math.abs(r1("a")._3 - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-9)
    // ties: a={1,1}, b={1,2}: bin1 holds 3 (midrank 2), T = 24,
    // var = (1/3)*(5 - 24/12) = 1, U_a = 1 -> z_a = -1
    val df2 = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val r2 = Profile.mannWhitneyBinned(df2, "g", "v", 0.0, 5.0, 5)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(2), x.getDouble(3))).toMap
    assert(r2("a") == ((1.0, -1.0)))
  }

  test("holtSmooth: hand fold and singleton/pair initialization") {
    import graft.operators.WindowOps
    val df = Seq(
      ("u1", 1L, 1.0), ("u1", 2L, 2.0), ("u1", 3L, 4.0), // full recursion
      ("u2", 1L, 7.0),                                   // singleton
      ("u3", 1L, 3.0), ("u3", 2L, 5.0)                   // init only
    ).toDF("k", "o", "v")
    val r = WindowOps.holtSmooth(df, Seq("k"), Seq("o"), "v",
        alpha = 0.5, beta = 0.25)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))
      .toMap
    // u1: l0=1,t0=1; v=4: l'=0.5*4+0.5*2=3, t'=0.25*2+0.75*1=1.25
    assert(r("u1") == ((3L, 3.0, 1.25, 4.25)))
    assert(r("u2") == ((1L, 7.0, 0.0, 7.0)))
    assert(r("u3") == ((2L, 3.0, 2.0, 5.0)))
  }

  test("holtSmooth: last-N truncation and partition invariance") {
    import graft.operators.WindowOps
    val base = Seq.tabulate(60)(i => ("u", i.toLong, math.sin(i * 0.7)))
      .toDF("k", "o", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      WindowOps.holtSmooth(df, Seq("k"), Seq("o"), "v", 0.5, 0.25,
          maxHistory = 16)
        .collect().map(_.toSeq).toSeq
    val full = run(base.repartition(1))
    assert(full.head(1) == 16L) // history capped
    assert(full == run(base.repartition(7)))
  }

  test("autocorr: hand-derived lags, zero-variance and short keys") {
    import graft.operators.WindowOps
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("b", 1L, 5.0), ("b", 2L, 5.0), ("b", 3L, 5.0), // zero variance
      ("c", 1L, 7.0)                                   // n <= lag
    ).toDF("k", "o", "v")
    val r = WindowOps.autocorr(df, Seq("k"), Seq("o"), "v", maxLag = 2)
      .collect().map(x => (x.getString(0), x.getInt(1)) ->
        (x.getLong(2), if (x.isNullAt(3)) None else Some(x.getDouble(3))))
      .toMap
    // series 1,2,3,4: r1 = 1.25/5 = 0.25; r2 = -1.5/5 = -0.3
    assert(r(("a", 1)) == ((4L, Some(0.25))))
    assert(r(("a", 2)) == ((4L, Some(-0.3))))
    assert(r(("b", 1)) == ((3L, None)) && r(("b", 2)) == ((3L, None)))
    assert(r(("c", 1)) == ((1L, None)) && r(("c", 2)) == ((1L, None)))
  }

  test("autocorr: invariant to input partitioning") {
    import graft.operators.WindowOps
    val base = Seq.tabulate(300)(i =>
      (s"g${i % 2}", i.toLong, math.sin(i * 0.5) + i % 3))
      .toDF("k", "o", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      WindowOps.autocorr(df, Seq("k"), Seq("o"), "v", maxLag = 3)
        .orderBy("k", "lag").collect().map(_.toSeq).toSeq
    assert(run(base.repartition(1)) == run(base.repartition(11)))
  }

  test("cramersV: perfect association, independence, zero cells") {
    import graft.operators.Profile
    // perfect: x<->p, y<->q; zero cells contribute their expectation
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val r1 = Profile.cramersV(perfect, "a", "b").collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((4L, 2L, 2L)))
    assert(r1.getDouble(3) == 4.0 && r1.getDouble(4) == 1.0)
    // independent: uniform 2x2 -> chi2 = 0, v = 0
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val r2 = Profile.cramersV(indep, "a", "b").collect()(0)
    assert(r2.getDouble(3) == 0.0 && r2.getDouble(4) == 0.0)
  }

  test("cramersV: invariant to input partitioning") {
    import graft.operators.Profile
    val base = Seq.tabulate(500)(i => (s"a${i % 3}", s"b${(i * 7) % 4}"))
      .toDF("a", "b")
    def run(df: org.apache.spark.sql.DataFrame) =
      Profile.cramersV(df, "a", "b").collect().map(_.toSeq).toSeq
    assert(run(base.repartition(1)) == run(base.repartition(13)))
  }

  test("welchTTest: invariant to input partitioning") {
    val base = Seq.tabulate(200)(i =>
      (s"g${i % 3}", math.sin(i * 0.37) * 5)).toDF("g", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Profile.welchTTest(df, "g", "v")
        .orderBy("group_a", "group_b").collect().map(_.toSeq).toSeq
    assert(run(base.repartition(1)) == run(base.repartition(9)))
  }

  test("degenerate inputs yield NULL statistics, never NaN/Inf") {
    import graft.operators.Profile
    // two constant groups → zero pooled standard error
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val t = Profile.welchTTest(const, "g", "v").collect()(0)
    assert(t.isNullAt(t.fieldIndex("t_stat")))
    assert(t.isNullAt(t.fieldIndex("welch_df")))
    // single-valued margin → min(R,C) = 1 → V undefined
    val oneCol = Seq(("x", "b0"), ("x", "b1"), ("x", "b2")).toDF("a", "b")
    val v = Profile.cramersV(oneCol, "a", "b").collect()(0)
    assert(v.isNullAt(v.fieldIndex("v")))
    assert(!v.isNullAt(v.fieldIndex("chi2"))) // chi2 itself is fine (0)
    // every value in one bin → tie mass cancels the rank variance
    val oneBin = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0)).toDF("g", "v")
    val mw = Profile.mannWhitneyBinned(oneBin, "g", "v", 0.0, 5.0, 5)
      .orderBy("g").collect()
    assert(mw.forall(r => r.isNullAt(r.fieldIndex("z"))))
    // a group that IS the whole corpus (n = N)
    val allOne = Seq(("a", 1.0), ("a", 3.0), ("a", 4.0)).toDF("g", "v")
    val mw2 = Profile.mannWhitneyBinned(allOne, "g", "v", 0.0, 5.0, 5)
      .collect()(0)
    assert(mw2.isNullAt(mw2.fieldIndex("z")))
  }
}
