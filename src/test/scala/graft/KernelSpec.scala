package graft

import graft.api.{DataFrame, Series}
import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel semantics per FIXTURES.md §B: broadcasting, IEEE edges,
  * alignment, exception texts. */
class KernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def sFromList(vs: Seq[Any]): Series = Series.fromList(spark, vs)

  test("from_list + scalar arithmetic") {
    val s = sFromList(Seq(1.0, 2.0, 3.0)).add(10)
    assert(s.collectItems().toMap == Map(0L -> 11.0, 1L -> 12.0, 2L -> 13.0))
  }

  test("IEEE division semantics (coercion.py:48-70)") {
    val s = sFromList(Seq(1.0, -1.0, 0.0, Double.PositiveInfinity, Double.NaN))
    val byZero = s.div(0).values
    assert(byZero(0) == Double.PositiveInfinity)
    assert(byZero(1) == Double.NegativeInfinity)
    assert(byZero(2).asInstanceOf[Double].isNaN) // 0/0 via sign(0)*inf
    assert(byZero(3) == Double.PositiveInfinity) // inf/0
    assert(byZero(4).asInstanceOf[Double].isNaN)
    val byInf = s.div(Double.PositiveInfinity).values
    assert(byInf(0) == 0.0 && byInf(1) == 0.0)
    assert(byInf(3).asInstanceOf[Double].isNaN) // inf/inf
    val floor = sFromList(Seq(7.0, -7.0)).floordiv(2).values
    assert(floor == Seq(3.0, -4.0))
  }

  test("numpy mod semantics (coercion.py:73-85)") {
    val s = sFromList(Seq(5.0, -5.0, Double.PositiveInfinity, Double.NaN))
    val m0 = s.mod(0).values
    assert(m0.forall(_.asInstanceOf[Double].isNaN))
    val mInf = s.mod(Double.PositiveInfinity).values
    assert(mInf(0) == 5.0)
    assert(mInf(1) == Double.PositiveInfinity) // signs disagree → rhs
    assert(mInf(2).asInstanceOf[Double].isNaN) // inf % x → NaN
    assert(s.mod(3).values(0) == 2.0)
    assert(s.mod(3).values(1) == -2.0) // SQL remainder: sign of dividend
  }

  test("bool coercion (coercion.py:88-116)") {
    val s = sFromList(Seq(true, false))
    assert(s.add(true).values == Seq(2, 1))
    assert(s.mul(3).values == Seq(3, 0))
  }

  test("Series x Series full-outer index alignment (base.py:72-79)") {
    val a = Series.fromLocal(spark, Seq(0 -> 1.0, 1 -> 2.0, 2 -> 3.0))
    val b = Series.fromLocal(spark, Seq(1 -> 10.0, 2 -> 20.0, 3 -> 30.0))
    val got = a.add(b).collectItems().toMap
    assert(got == Map(0 -> null, 1 -> 12.0, 2 -> 23.0, 3 -> null))
    val filled = a.add(b, fillValue = Some(0.0)).collectItems().toMap
    assert(filled == Map(0 -> 0.0, 1 -> 12.0, 2 -> 23.0, 3 -> 0.0))
  }

  test("self-join aliasing (alchemy.py:202-204)") {
    val a = Series.fromLocal(spark, Seq(0 -> 1.0, 1 -> 2.0))
    assert(a.add(a).collectItems().toMap == Map(0 -> 2.0, 1 -> 4.0))
  }

  test("DataFrame column outer alignment (base.py:64-70)") {
    val l = DataFrame.fromLocal(spark, Seq("a", "b"), Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    val r = DataFrame.fromLocal(spark, Seq("b", "c"), Seq(Seq(10.0, 100.0), Seq(20.0, 200.0)))
    val res = l.add(r)
    assert(res.columns == IndexedSeq(Some("a"), Some("b"), Some("c")))
    val rows = res.frame.df.orderBy("__idx_0").collect()
    assert(rows(0).get(1) == null) // a: missing right → NULL
    assert(rows(0).get(2) == 12.0) // b aligned
    assert(rows(0).get(3) == null) // c: missing left
  }

  test("list broadcast axis=1 + exact error text (alchemy.py:216-218)") {
    val l = DataFrame.fromLocal(spark, Seq("a", "b"), Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    val res = l.add(Seq(10, 20))
    assert(res.frame.df.orderBy("__idx_0").collect()(0).get(1) == 11.0)
    val e = intercept[GraftValueError](l.add(Seq(1, 2, 3)))
    assert(e.getMessage == "Unable to coerce to Series, length must be 2: given 3")
  }

  test("list broadcast axis=0 paste-join (base.py:118-128)") {
    val l = DataFrame.fromLocal(spark, Seq("a"), Seq(Seq(1.0), Seq(2.0), Seq(3.0)))
    val res = l.add(Seq(10, 20, 30), axis = 0)
    assert(res.frame.df.orderBy("__idx_0").collect().map(_.get(1)).toSeq ==
      Seq(11.0, 22.0, 33.0))
    val e = intercept[GraftValueError](l.add(Seq(1, 2), axis = 0))
    assert(e.getMessage == "Unable to coerce to Series, length must be 3: given 2")
  }

  test("Series list-shape error text (alchemy.py:437-438)") {
    val s = sFromList(Seq(1.0, 2.0, 3.0))
    val e = intercept[GraftValueError](s.add(Seq(1, 2)))
    assert(e.getMessage == "operands could not be broadcast together with shapes (3,) (2,)")
    // lax single-element unwrap (alchemy.py:425-429)
    assert(s.add(Seq(5)).values == Seq(6.0, 7.0, 8.0))
  }

  test("head/tail/iat (generic.py:46-57, alchemy.py:146-163)") {
    val s = sFromList(Seq(1, 2, 3, 4, 5))
    assert(s.head(2).values == Seq(1, 2))
    assert(s.tail(2).values == Seq(4, 5))
    assert(s.iat(0) == 1 && s.iat(-1) == 5)
    val e = intercept[GraftIndexError](s.iat(7))
    assert(e.getMessage == "index 7 is out of bounds for axis 0 with size 5")
  }

  test("unary ops + applymap na_action (generic.py:69-83, alchemy.py:264-275)") {
    val df = DataFrame.fromLocal(spark, Seq("x"), Seq(Seq(-1.5), Seq(null), Seq(2.5)))
    assert(df.isna.frame.df.orderBy("__idx_0").collect().map(_.get(1)).toSeq ==
      Seq(false, true, false))
    assert(df.abs.frame.df.orderBy("__idx_0").collect().map(_.get(1)).toSeq ==
      Seq(1.5, null, 2.5))
    val am = df.applymap(c => c * 2, naAction = Some("ignore"))
    assert(am.frame.df.orderBy("__idx_0").collect().map(_.get(1)).toSeq ==
      Seq(-3.0, null, 5.0))
    val e = intercept[GraftValueError](df.applymap(identity, Some("bogus")))
    assert(e.getMessage == "na_action must be 'ignore' or None. Got 'bogus'")
  }

  test("clip (alchemy.py:254-262)") {
    val df = DataFrame.fromLocal(spark, Seq("x"), Seq(Seq(1.0), Seq(5.0), Seq(9.0)))
    assert(df.clip(2, 8).frame.df.orderBy("__idx_0").collect().map(_.get(1)).toSeq ==
      Seq(2.0, 5.0, 8.0))
    val e = intercept[GraftValueError](df.clip(Seq(1, 2, 3), null))
    assert(e.getMessage == "Must specify axis=0 or 1")
  }

  test("level join: flat x MultiIndex (base.py:86-102)") {
    // multi side (ym, d) vs flat side keyed on ym
    val multi = new DataFrame(SqlFrame.fromSpark(
      spark.createDataFrame(Seq((2024, 1, 10.0), (2024, 2, 20.0), (2025, 1, 30.0)))
        .toDF("ym", "d", "v"), Seq("ym", "d")))
    val flat = new DataFrame(SqlFrame.fromSpark(
      spark.createDataFrame(Seq((2024, 100.0), (2025, 200.0))).toDF("ym", "v"),
      Seq("ym")))
    val res = multi.add(flat, axis = 0, level = Some("ym"))
    assert(res.frame.nIdx == 2)
    val vals = res.frame.df.orderBy("__idx_0", "__idx_1").collect().map(_.get(2)).toSeq
    assert(vals == Seq(110.0, 120.0, 230.0))
  }

  test("multi x multi level join is ambiguous (base.py:101-102)") {
    val mk = () => new DataFrame(SqlFrame.fromSpark(
      spark.createDataFrame(Seq((1, 2, 3.0))).toDF("a", "b", "v"), Seq("a", "b")))
    val e = intercept[GraftTypeError](mk().add(mk(), axis = 0, level = Some(0)))
    assert(e.getMessage == "Join on level between two MultiIndex objects is ambiguous")
  }

  test("multi x multi Series alignment via names join → NotImplementedError (base.py:116)") {
    val mk = () => new DataFrame(SqlFrame.fromSpark(
      spark.createDataFrame(Seq((1, 2, 3.0))).toDF("a", "b", "v"), Seq("a", "b")))
    val s1 = mk()("v"); val s2 = mk()("v")
    intercept[GraftNotImplementedError](s1.add(s2))
  }

  test("head/tail edge cases on short frames (generic.py:46-57)") {
    val s = sFromList(Seq(1, 2))
    assert(s.head(10).values == Seq(1, 2))
    assert(s.tail(10).values == Seq(1, 2))
    assert(s.tail(0).values == Seq())
  }

  test("tailOnePass (extension): matches two-job tail under any partitioning") {
    // multi-partition + ragged/empty partitions: repartition scatters
    // rows, so every partition contributes a different-sized buffer
    val parquet = DataFrame.fromParquet(spark,
      "/root/testdata/sf0.001/nation.parquet", index = Seq("n_nationkey"))
    for (n <- Seq(0, 3, 25, 40)) {
      val want = parquet.tail(n).frame.df.orderBy("__idx_0").collect().toSeq
      val got = parquet.tailOnePass(n).frame.df.orderBy("__idx_0").collect().toSeq
      assert(got == want, s"tailOnePass($n) diverged from tail($n)")
    }
    val s = sFromList(Seq(1, 2, 3, 4, 5))
    assert(s.tailOnePass(2).values == Seq(4, 5))
    assert(s.tailOnePass(0).values == Seq())
    assert(s.tailOnePass(10).values == Seq(1, 2, 3, 4, 5))
  }

  test("parquet from_table with promoted index (alchemy.py:313-350)") {
    val df = DataFrame.fromParquet(spark, "/root/testdata/sf0.001/nation.parquet",
      index = Seq("n_nationkey"))
    assert(df.columns.flatten == IndexedSeq("n_name", "n_regionkey"))
    assert(df.len == 25)
    val s = df("n_name")
    assert(s.name == Some("n_name"))
  }

  test("same-base Series combine fuses to a projection — no join in plan") {
    val df = DataFrame.fromParquet(spark, "/root/testdata/sf0.001/lineitem.parquet",
      index = Seq("l_orderkey", "l_linenumber"))
    val revenue = df("l_extendedprice") * df("l_discount").rsub(1.0)
    val plan = revenue.frame.df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"fused series op should not join:\n$plan")
    val viaSql = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .selectExpr("sum(l_extendedprice * (1 - l_discount)) s").collect()(0).getDouble(0)
    val got = revenue.frame.df.selectExpr("sum(__col_0) s").collect()(0).getDouble(0)
    assert(math.abs(got - viaSql) < 1e-6)
  }

  test("withColumn fused + foreign") {
    val df = DataFrame.fromLocal(spark, Seq("a"), Seq(Seq(1.0), Seq(2.0)))
    val out = df.withColumn("b", df("a") * 10)
    assert(out.columns.flatten == IndexedSeq("a", "b"))
    assert(out.frame.df.orderBy("__idx_0").collect().map(_.get(2)).toSeq == Seq(10.0, 20.0))
    val foreign = Series.fromLocal(spark, Seq(0L -> 7.0, 1L -> 8.0))
    val out2 = df.withColumn("c", foreign)
    assert(out2.frame.df.orderBy("__idx_0").collect().map(_.get(2)).toSeq == Seq(7.0, 8.0))
  }

  test("Series op DataFrame returns a DataFrame ≡ df.r<op>(series, axis=0)") {
    val df = DataFrame.fromLocal(spark, Seq("a", "b"),
      Seq(Seq[Any](1.0, 10.0), Seq[Any](2.0, 20.0)))
    val s = Series.fromList(spark, Seq(100.0, 200.0))
    val got = s.sub(df)                       // series - df, natural dispatch
    val expect = df.rsub(s, axis = 0)         // the reference's spelling
    assert(got.frame.df.orderBy("__idx_0").collect().toSeq.map(_.toSeq) ==
      expect.frame.df.orderBy("__idx_0").collect().toSeq.map(_.toSeq))
    val gotRows = got.frame.df.orderBy("__idx_0").collect()
    assert(gotRows(0).get(1) == 99.0 && gotRows(0).get(2) == 90.0)
    // comparison overload too
    val mask = s.gt(df)
    assert(mask.frame.df.orderBy("__idx_0").collect()(0).get(1) == true)
  }

  test("withColumn on an existing label overwrites in place (no duplicate labels)") {
    val df = DataFrame.fromLocal(spark, Seq("a", "b"),
      Seq(Seq[Any](1.0, 10.0), Seq[Any](2.0, 20.0)))
    // same-base overwrite: label count unchanged, position kept
    val out = df.withColumn("a", df("a") * 100)
    assert(out.columns.flatten == IndexedSeq("a", "b"))
    assert(out.frame.df.orderBy("__idx_0").collect().map(_.get(1)).toSeq == Seq(100.0, 200.0))
    // foreign overwrite: LEFT-aligned values replace the column, same position
    val s = Series.fromLocal(spark, Seq(0L -> 7.0, 1L -> 8.0))
    val out2 = df.withColumn("b", s)
    assert(out2.columns.flatten == IndexedSeq("a", "b"))
    val rows = out2.frame.df.orderBy("__idx_0").collect()
    assert(rows.map(_.get(2)).toSeq == Seq(7.0, 8.0))
    assert(rows.map(_.get(1)).toSeq == Seq(1.0, 2.0))
  }

  test("str.extract returns NULL (not \"\") when the pattern does not match") {
    val s = Series.fromLocal(spark, Seq(0 -> "x1y", 1 -> "abc"))
    assert(s.str.extract("(\\d)").values == Seq("1", null))
  }

  test("str.extract: non-participating capture group → NULL, empty participating capture → \"\"") {
    // pandas semantics: on "x1y" the (z) arm never participates → NaN;
    // Spark's regexp_extract would return "" for both and conflate them
    // with the genuinely empty capture of (a*) on "bbb"
    val s = Series.fromLocal(spark, Seq(0 -> "x1y", 1 -> "zzz"))
    assert(s.str.extract("(\\d)|(z)", 1).values == Seq("1", null))
    assert(s.str.extract("(\\d)|(z)", 2).values == Seq(null, "z"))
    val e = Series.fromLocal(spark, Seq(0 -> "bbb"))
    assert(e.str.extract("(a*)", 1).values == Seq(""))
    // out-of-range group is an analysis-time failure, not a runtime one
    intercept[org.apache.spark.sql.AnalysisException] {
      Series.fromLocal(spark, Seq(0 -> "x")).str.extract("(a)", 2).values
    }
  }

  test("withColumn foreign Series LEFT-aligns: disjoint index keys add no rows") {
    // pandas: df[c] = s reindexes s to df.index — s's extra key 5 is
    // dropped, df's unmatched key 1 gets NULL; row count stays 2
    val df = DataFrame.fromLocal(spark, Seq("a"), Seq(Seq(1.0), Seq(2.0)))
    val s = Series.fromLocal(spark, Seq(0L -> 7.0, 5L -> 9.0))
    val out = df.withColumn("c", s)
    val rows = out.frame.df.orderBy("__idx_0").collect()
    assert(rows.length == 2, s"assignment must not invent rows, got ${rows.length}")
    assert(rows.map(_.get(0)).toSeq == Seq(0L, 1L))
    assert(rows(0).get(2) == 7.0 && rows(1).get(2) == null)
  }

  test("DataFrame op Series axis=1: column labels align with series index values (alchemy.py:187-196)") {
    val df = DataFrame.fromLocal(spark, Seq("a", "b"),
      Seq(Seq[Any](1.0, 10.0), Seq[Any](2.0, 20.0)))
    // series indexed by labels {b, c}: b matches column b, a gets NULL
    // operand, c appears as an all-NULL column
    val s = Series.fromLocal(spark, Seq("b" -> 100.0, "c" -> 7.0))
    val res = df.add(s, axis = 1)
    assert(res.columns.flatten == IndexedSeq("a", "b", "c"))
    val rows = res.frame.df.orderBy("__idx_0").collect()
    assert(rows(0).get(1) == null)      // a + NULL
    assert(rows(0).get(2) == 110.0)     // b + 100
    assert(rows(0).get(3) == null)      // NULL + c-value
  }

  test("names join with no overlapping index names errors (base.py:107)") {
    val multi = new DataFrame(SqlFrame.fromSpark(
      spark.createDataFrame(Seq((1, 2, 3.0))).toDF("x", "y", "v"), Seq("x", "y")))
    val flat = new DataFrame(SqlFrame.fromSpark(
      spark.createDataFrame(Seq((1, 5.0))).toDF("z", "v"), Seq("z")))
    val e = intercept[GraftValueError](multi.add(flat, axis = 0))
    assert(e.getMessage == "cannot join with no overlapping index names")
  }

  test("names join infers the level from the overlapping name (base.py:104-116)") {
    val multi = new DataFrame(SqlFrame.fromSpark(
      spark.createDataFrame(Seq((2024, 1, 10.0), (2025, 2, 20.0))).toDF("ym", "d", "v"),
      Seq("ym", "d")))
    val flat = new DataFrame(SqlFrame.fromSpark(
      spark.createDataFrame(Seq((2024, 100.0), (2025, 200.0))).toDF("ym", "v"),
      Seq("ym")))
    val res = flat.add(multi, axis = 0) // flat x multi, level inferred = ym
    assert(res.frame.nIdx == 2)
    val vals = res.frame.df.orderBy("__idx_0").collect().map(_.get(2)).toSeq
    assert(vals == Seq(110.0, 220.0))
  }

  test("isin/between/str/dt accessors fuse on the base") {
    val s = Series.fromLocal(spark, Seq(0 -> "Hello", 1 -> "world"))
    assert(s.isin(Seq("Hello", "x")).values == Seq(true, false))
    assert(s.str.upper.values == Seq("HELLO", "WORLD"))
    assert(s.str.len.values == Seq(5, 5))
    assert(s.str.contains("orl").values == Seq(false, true))
    assert(s.str.slice(0, 2).values == Seq("He", "wo"))
    assert(s.str.extract("([lo]+)").values == Seq("llo", "o"))
    assert(s.str.pad(7, "_").values == Seq("__Hello", "__world"))
    assert(s.str.count("[lo]").values == Seq(3, 2))
    assert(s.str.split("l").values.map(_.asInstanceOf[scala.collection.Seq[String]].length) == Seq(3, 2))
    val nums = sFromList(Seq(5, 15, 25))
    assert(nums.between(10, 20).values == Seq(false, true, false))
    // fusion: accessor chains produce no join
    val plan = s.str.upper.str.len.frame.df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"))
  }

  test("str accessor round-out: zfill/find/get/capitalize/classes/repeat/strips") {
    val s = Series.fromLocal(spark, Seq(0 -> "-42", 1 -> "7", 2 -> "Hello"))
    // pandas zfill: zeros AFTER the sign; never truncates
    assert(s.str.zfill(5).values == Seq("-0042", "00007", "Hello"))
    assert(s.str.zfill(2).values == Seq("-42", "07", "Hello"))
    // find: 0-based, -1 when absent (pandas), not Spark's 0
    assert(s.str.find("l").values == Seq(-1, -1, 2))
    // get: char at position, NULL past the end (pandas NaN)
    assert(s.str.get(1).values == Seq("4", null, "e"))
    assert(s.str.capitalize.values == Seq("-42", "7", "Hello"))
    assert(s.str.isdigit.values == Seq(false, true, false))
    assert(s.str.isalpha.values == Seq(false, false, true))
    assert(s.str.isalnum.values == Seq(false, true, true))
    val ws = Series.fromLocal(spark, Seq(0 -> "  x ", 1 -> "\t\n",
      2 -> "\u000bx\u000b")) // vertical tab: pandas strips it, isspace true
    assert(ws.str.isspace.values == Seq(false, true, false))
    assert(ws.str.strip.values == Seq("x", "", "x"))
    assert(ws.str.lstrip.values == Seq("x ", "", "x\u000b"))
    assert(ws.str.rstrip.values == Seq("  x", "", "\u000bx"))
    assert(s.str.repeat(2).values == Seq("-42-42", "77", "HelloHello"))
  }

  test("str.get negative index counts from the end (pandas get(-1) = last char)") {
    val s = Series.fromLocal(spark, Seq(0 -> "Hello", 1 -> "x", 2 -> ""))
    assert(s.str.get(-1).values == Seq("o", "x", null))
    assert(s.str.get(-5).values == Seq("H", null, null))
    assert(s.str.get(-6).values == Seq(null, null, null))
  }

  test("str Unicode class variants: NBSP/Unicode digits classify pandas-style; ASCII forms unchanged") {
    // u0660/u0661 = Arabic-Indic digits; u00e9 = e-acute; u00a0 = NBSP
    val s = Series.fromLocal(spark, Seq(
      0 -> "٠١", 1 -> "café", 2 -> " \t", 3 -> "42"))
    assert(s.str.isdigit.values == Seq(false, false, false, true))
    assert(s.str.isdigitUnicode.values == Seq(true, false, false, true))
    assert(s.str.isalpha.values == Seq(false, false, false, false))
    assert(s.str.isalphaUnicode.values == Seq(false, true, false, false))
    assert(s.str.isalnumUnicode.values == Seq(true, true, false, true))
    assert(s.str.isspace.values == Seq(false, false, false, false))
    assert(s.str.isspaceUnicode.values == Seq(false, false, true, false))
    val ws = Series.fromLocal(spark, Seq(0 -> "\u00a0x\u00a0", 1 -> " y "))
    assert(ws.str.strip.values == Seq("\u00a0x\u00a0", "y"))
    assert(ws.str.stripUnicode.values == Seq("x", "y"))
  }

  test("dt accessor round-out: weekday/week/daysInMonth/month boundaries") {
    val d = Series.fromLocal(spark, Seq(
      0 -> java.sql.Date.valueOf("2024-02-01"),   // Thu, leap Feb
      1 -> java.sql.Date.valueOf("2024-02-29"),   // Thu, month end
      2 -> java.sql.Date.valueOf("2026-08-15")))  // Sat
    assert(d.dt.dayofyear.values == Seq(32, 60, 227))
    assert(d.dt.quarter.values == Seq(1, 1, 3))
    // pandas weekday: Monday=0 … Sunday=6 (Thu=3, Sat=5)
    assert(d.dt.weekday.values == Seq(3, 3, 5))
    assert(d.dt.week.values == Seq(5, 9, 33)) // ISO weeks
    assert(d.dt.daysInMonth.values == Seq(29, 29, 31))
    assert(d.dt.isMonthStart.values == Seq(true, false, false))
    assert(d.dt.isMonthEnd.values == Seq(false, true, false))
    assert(d.dt.minute.values == Seq(0, 0, 0))
    assert(d.dt.second.values == Seq(0, 0, 0))
  }

  test("duplicate column labels survive positional addressing (base.py:21-23)") {
    val base = DataFrame.fromLocal(spark, Seq("x", "y"),
      Seq(Seq[Any](1.0, 2.0), Seq[Any](3.0, 4.0)))
    // force duplicate labels via rename, then operate
    val dup = base.renameColumns(Map("y" -> "x"))
    assert(dup.columns == IndexedSeq(Some("x"), Some("x")))
    val doubled = dup.mul(10)
    assert(doubled.columns == IndexedSeq(Some("x"), Some("x")))
    val row = doubled.frame.df.orderBy("__idx_0").collect()(0)
    assert(row.get(1) == 10.0 && row.get(2) == 20.0) // both columns kept
    // exported names dedupe (x, x_1)
    assert(doubled.toSpark().columns.toSeq == Seq("x", "x_1"))
    // positional access: colAt(1) is the second x
    assert(dup.colAt(1).values == Seq(2.0, 4.0))
  }

  test("Series clip with list bounds uses paste-join, lax disabled (alchemy.py:465-468)") {
    val s = sFromList(Seq(5.0, 5.0, 5.0))
    val clipped = s.clip(lower = Seq(1.0, 6.0, 2.0), upper = Seq(10.0, 10.0, 3.0))
    assert(clipped.values == Seq(5.0, 6.0, 3.0))
    // single-element list is NOT unwrapped for clip (lax=False) → must
    // fail the length check like the reference
    intercept[GraftValueError](s.clip(lower = Seq(1.0)))
  }

  test("reverse ops apply operands swapped (ops_mixin/alchemy reverse=True)") {
    val s = sFromList(Seq(2.0, 4.0))
    assert(s.rsub(10).values == Seq(8.0, 6.0))     // 10 - x
    assert(s.rdiv(8).values == Seq(4.0, 2.0))      // 8 / x
    assert(s.rpow(2).values == Seq(4.0, 16.0))     // 2 ^ x
    assert(s.rmod(5).values == Seq(1.0, 1.0))      // 5 % x
  }

  test("bad axis → exact pandas ValueError (base.py:48-53)") {
    val df = DataFrame.fromLocal(spark, Seq("a"), Seq(Seq(1.0)))
    val e = intercept[GraftValueError](df.add(1, axis = 2))
    assert(e.getMessage == "No axis named 2 for object type DataFrame")
    val s = Series.fromList(spark, Seq(1.0))
    val e2 = intercept[GraftValueError](s.add(1, axis = 1))
    assert(e2.getMessage == "No axis named 1 for object type Series")
  }

  test("driver entry smoke: flagship query returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("bool() probes (generic.py:35-44)") {
    val t = sFromList(Seq(true))
    assert(t.boolValue())
    val e = intercept[GraftValueError](sFromList(Seq(true, false)).boolValue())
    assert(e.getMessage.startsWith("The truth value of a Series is ambiguous"))
    val e2 = intercept[GraftValueError](sFromList(Seq(3)).boolValue())
    assert(e2.getMessage == "bool cannot act on a non-boolean single element Series")
  }
}
