package graft

import graft.api.{DataFrame, Frames, Series}
import org.scalatest.funsuite.AnyFunSuite

/** Extension surface: groupby/merge/sort/mask/concat/dedup. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("groupby agg matches raw Spark") {
    val li = DataFrame.fromParquet(spark, s"$dir/lineitem.parquet")
    val g = li.groupby(Seq("l_returnflag")).agg(("l_quantity", "sum", "sq"))
    val got = g.toSpark(includeIndex = true).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").sum("l_quantity").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-6) }
  }

  test("isin/between/str chains over one base fuse to a single Project over one scan") {
    // the q_isin_str shape — SCALE.md's load-bearing fusion contract:
    // stacking same-base Series transforms must stay ONE projection over
    // ONE parquet scan, never a per-column join/align or a second scan
    val li = DataFrame.fromParquet(spark, s"$dir/lineitem.parquet",
      index = Seq("l_orderkey", "l_linenumber"))
    val out = li.select(Nil)
      .withColumn("flag_in", li("l_returnflag").isin(Seq("R", "A")))
      .withColumn("qty_mid", li("l_quantity").between(10, 20))
      .withColumn("flag_up", li("l_linestatus").str.lower)
      .toSpark(includeIndex = true)
    val plan = out.queryExecution.executedPlan.toString
    def occurrences(sub: String): Int =
      plan.sliding(sub.length).count(_ == sub)
    assert(occurrences("FileScan") == 1, s"expected one scan:\n$plan")
    assert(occurrences("Project") == 1, s"expected one fused Project:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"fused chain must not shuffle or align-join:\n$plan")
    assert(out.count() == spark.read.parquet(s"$dir/lineitem.parquet").count())
  }

  test("where with same-base mask pushes filter to scan") {
    val li = DataFrame.fromParquet(spark, s"$dir/lineitem.parquet")
    val filtered = li.select(Seq("l_quantity")).where(li("l_quantity") > 45)
    val plan = filtered.frame.df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"expected parquet pushdown:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
    val n = filtered.len
    val exp = spark.read.parquet(s"$dir/lineitem.parquet")
      .where("l_quantity > 45").count()
    assert(n == exp)
  }

  test("where with foreign mask = left semi on index") {
    val a = Series.fromLocal(spark, Seq(0 -> 1.0, 1 -> 2.0, 2 -> 3.0))
    val mask = Series.fromLocal(spark, Seq(0 -> false, 1 -> true, 2 -> true))
    assert(a.where(mask).values.toSet == Set(2.0, 3.0))
  }

  test("merge inner + suffixes") {
    val l = DataFrame.fromLocal(spark, Seq("k", "v"),
      Seq(Seq[Any](1, 10.0), Seq[Any](2, 20.0)))
    val r = DataFrame.fromLocal(spark, Seq("k", "v"),
      Seq(Seq[Any](2, 200.0), Seq[Any](3, 300.0)))
    val m = l.merge(r, Seq("k"))
    assert(m.columns.flatten.toSet == Set("k", "v_x", "v_y"))
    val rows = m.toSpark().collect()
    assert(rows.length == 1 && rows(0).getInt(0) == 2)
  }

  test("concat aligns labels outer") {
    val a = DataFrame.fromLocal(spark, Seq("x"), Seq(Seq(1.0)))
    val b = DataFrame.fromLocal(spark, Seq("y"), Seq(Seq(2.0)))
    val c = Frames.concat(Seq(a, b))
    assert(c.columns.flatten == IndexedSeq("x", "y"))
    assert(c.len == 2)
  }

  test("sortValues + head = top-k") {
    val o = DataFrame.fromParquet(spark, s"$dir/orders.parquet")
    val top = o.select(Seq("o_orderkey", "o_totalprice"))
      .sortValues(Seq("o_totalprice"), Seq(false)).head(5)
    val vals = top.toSpark().collect().map(_.getDouble(1)).toSeq
    assert(vals == vals.sorted.reverse)
    val expMax = spark.read.parquet(s"$dir/orders.parquet")
      .agg(org.apache.spark.sql.functions.max("o_totalprice")).collect()(0).getDouble(0)
    assert(vals.head == expMax)
  }

  test("value_counts ordered desc") {
    val s = Series.fromList(spark, Seq("a", "b", "a", "c", "a", "b"))
    val vc = s.valueCounts().collectItems()
    assert(vc.map(_._1) == Seq("a", "b", "c"))
    assert(vc.map(_._2) == Seq(3L, 2L, 1L))
  }

  test("dropDuplicates + nunique") {
    val d = DataFrame.fromLocal(spark, Seq("a", "b"),
      Seq(Seq(1, "x"), Seq(1, "x"), Seq(2, "y")))
    assert(d.dropDuplicates().len == 2)
    val nu = d.nunique().toSpark().collect()(0)
    assert(nu.getLong(0) == 2 && nu.getLong(1) == 2)
  }

  test("quantile: exact percentile with linear interpolation") {
    val s = Series.fromList(spark, Seq(1.0, 2.0, 3.0, 4.0))
    assert(s.quantile(0.5) == 2.5)
    assert(s.quantiles(Seq(0.0, 0.25, 1.0)) == Seq(1.0, 1.75, 4.0))
    intercept[IllegalArgumentException] { s.quantile(1.5) }
  }

  test("nlargest/nsmallest plan as TakeOrderedAndProject") {
    val o = DataFrame.fromParquet(spark, s"$dir/orders.parquet")
    val nl = o("o_totalprice").nlargest(5)
    val plan = nl.frame.df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
    val vals = nl.values.map(_.asInstanceOf[Double])
    assert(vals.length == 5 && vals == vals.sorted.reverse)
    val ns = o("o_totalprice").nsmallest(3).values.map(_.asInstanceOf[Double])
    val expMin = spark.read.parquet(s"$dir/orders.parquet")
      .agg(org.apache.spark.sql.functions.min("o_totalprice")).collect()(0).getDouble(0)
    assert(ns.length == 3 && ns == ns.sorted && ns.head == expMin)
  }

  test("setIndex/resetIndex/loc") {
    val o = DataFrame.fromParquet(spark, s"$dir/orders.parquet",
      columns = Seq("o_orderkey", "o_totalprice"))
    val byKey = o.setIndex(Seq("o_orderkey"))
    assert(byKey.columns.flatten == IndexedSeq("o_totalprice"))
    val one = byKey.loc(7L).toSpark(includeIndex = true).collect()
    assert(one.length == 1 && one(0).getLong(0) == 7L)
    val back = byKey.resetIndex()
    assert(back.columns.flatten.toSet == Set("o_orderkey", "o_totalprice"))
    assert(back.len == o.len)
    intercept[graft.core.GraftKeyError] { o.setIndex(Seq("nope")) }
  }

  test("partitioned parquet write prunes by partition column") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    val d = DataFrame.fromParquet(spark, s"$dir/documents.parquet",
      columns = Seq("doc_id", "lang", "n_chars"))
    d.writeParquet(s"$tmp/docs", includeIndex = false,
      partitionBy = Seq("lang"))
    val langs = new java.io.File(s"$tmp/docs").listFiles()
      .map(_.getName).filter(_.startsWith("lang="))
    assert(langs.length > 1, s"expected hive partitions, got ${langs.toSeq}")
    val back = spark.read.parquet(s"$tmp/docs")
      .where(org.apache.spark.sql.functions.col("lang") === "en")
    assert(back.count() > 0)
  }

  test("csv/json/table sources round-trip the parquet frame") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-src").toString
    val d = spark.read.parquet(s"$dir/nation.parquet")
    d.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    d.write.mode("overwrite").json(s"$tmp/json")
    val c = DataFrame.fromCsv(spark, s"$tmp/csv", index = Seq("n_nationkey"))
    assert(c.len == d.count())
    assert(c.columns.flatten.contains("n_name"))
    assert(DataFrame.fromJson(spark, s"$tmp/json").len == d.count())
    d.createOrReplaceTempView("nation_v")
    assert(DataFrame.fromTable(spark, "nation_v").len == d.count())
  }

  test("orc/csv/json sinks round-trip through their matching sources") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val n = DataFrame.fromParquet(spark, s"$dir/nation.parquet",
      index = Seq("n_nationkey"))
    n.writeOrc(s"$tmp/orc", partitionBy = Seq("n_regionkey"))
    val o = DataFrame.fromOrc(spark, s"$tmp/orc", index = Seq("n_nationkey"))
    assert(o.len == n.len)
    assert(o.columns.flatten.toSet.contains("n_name"))
    n.writeCsv(s"$tmp/csv")
    assert(DataFrame.fromCsv(spark, s"$tmp/csv").len == n.len)
    n.writeJson(s"$tmp/json")
    assert(DataFrame.fromJson(spark, s"$tmp/json").len == n.len)
    // crawl-style compressed JSONL: gzip on write, transparent on read
    n.writeJson(s"$tmp/json_gz", options = Map("compression" -> "gzip"))
    val gzFiles = new java.io.File(s"$tmp/json_gz").listFiles()
      .map(_.getName).filter(_.endsWith(".gz"))
    assert(gzFiles.nonEmpty, "no .gz part files written")
    assert(DataFrame.fromJson(spark, s"$tmp/json_gz").len == n.len)
  }

  test("unstack pivots the last index level into columns") {
    val ev = DataFrame.fromParquet(spark, s"$dir/events.parquet",
      columns = Seq("user_id", "event_type", "event_id"))
      .groupby(Seq("user_id", "event_type")).count("n")
      .unstack(Seq("click", "purchase")).fillna(0L)
    val out = ev.toSpark(includeIndex = true)
    assert(out.columns.toSeq == Seq("user_id", "click", "purchase"))
    val direct = spark.read.parquet(s"$dir/events.parquet")
      .where(org.apache.spark.sql.functions.col("event_type") === "click")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct.forall { case (u, n) => got(u) == n })
  }

  test("replace maps listed values, passes others through") {
    val s = Series.fromList(spark, Seq("a", "b", "c"))
      .replace(Seq("a" -> "A", "b" -> "B"))
    assert(s.values.toSet == Set("A", "B", "c"))
  }

  test("map sends unmapped values to null; any/all/mode scalars") {
    val s = Series.fromList(spark, Seq("a", "b", "c"))
      .map(Seq("a" -> "A", "b" -> "B"))
    assert(s.values.toSet == Set("A", "B", null))
    val b = Series.fromList(spark, Seq(true, false, true))
    assert(b.any() && !b.all())
    assert(Series.fromList(spark, Seq.empty[Boolean]).all())
    assert(!Series.fromList(spark, Seq.empty[Boolean]).any())
    assert(Series.fromList(spark, Seq(3, 1, 1, 2, 3)).mode() == 1)
  }

  test("drop removes listed columns, errors on unknown") {
    val d = DataFrame.fromLocal(spark, Seq("a", "b", "c"),
      Seq(Seq[Any](1.0, 2.0, 3.0)))
    assert(d.drop(Seq("b")).columns.flatten == IndexedSeq("a", "c"))
    intercept[graft.core.GraftKeyError] { d.drop(Seq("zz")) }
  }

  test("pivotAgg sums per pivot value in one pass") {
    val d = DataFrame.fromLocal(spark, Seq("k", "p", "v"),
      Seq(Seq[Any]("x", "F", 1.0), Seq[Any]("x", "O", 2.0), Seq[Any]("x", "F", 3.0)))
    val p = d.groupby(Seq("k")).pivotAgg("p", Seq("F", "O"), "v")
    val r = p.toSpark(includeIndex = true).collect()(0)
    assert(r.getString(0) == "x" && r.getDouble(1) == 4.0 && r.getDouble(2) == 2.0)
  }

  test("groupby transform broadcasts the group aggregate onto rows") {
    val d = DataFrame.fromLocal(spark, Seq("k", "v"),
      Seq(Seq[Any]("a", 1.0), Seq[Any]("a", 2.0), Seq[Any]("b", 10.0)))
    val t = d.groupby(Seq("k")).transform("v", "sum", "s")
    val rows = t.toSpark().collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(rows(("a", 1.0)) == 3.0 && rows(("a", 2.0)) == 3.0 && rows(("b", 10.0)) == 10.0)
    intercept[graft.core.GraftKeyError] { d.groupby(Seq("k")).transform("zz", "sum", "s") }
  }

  test("duplicated marks everything after the first index occurrence") {
    val d = DataFrame.fromLocal(spark, Seq("k"),
      Seq(Seq[Any]("x"), Seq[Any]("x"), Seq[Any]("y")))
    val items = d.duplicated().collectItems()
      .sortBy(_._1.asInstanceOf[Number].longValue)
    assert(items.map(_._2) == Seq(false, true, false))
  }

  test("combine_first patches nulls and missing rows from other") {
    val a = DataFrame.fromLocal(spark, Seq("v"), Seq(Seq[Any](1.0)))   // index 0
    val b = DataFrame.fromLocal(spark, Seq("v", "w"),
      Seq(Seq[Any](9.0, 5.0), Seq[Any](7.0, 6.0)))                     // index 0, 1
    val c = a.combineFirst(b)
    val got = c.toSpark(includeIndex = true).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // index 0: a's v wins, w comes from b; index 1: entirely from b
    assert(got(0L) == ((1.0, 5.0)) && got(1L) == ((7.0, 6.0)))
  }

  test("cut right-closed fixed bins, qcut quantile bins") {
    val s = Series.fromList(spark, Seq(1.0, 5.0, 10.0, 20.0))
    val items = s.cut(Seq(0.0, 5.0, 15.0), Seq("a", "b")).collectItems()
      .sortBy(_._1.asInstanceOf[Number].longValue)
    assert(items.map(_._2) == Seq("a", "a", "b", null))
    val q = Series.fromList(spark, (1 to 8).map(_.toDouble)).qcut(2).collectItems()
      .sortBy(_._1.asInstanceOf[Number].longValue)
    assert(q.map(_._2) == Seq("q1", "q1", "q1", "q1", "q2", "q2", "q2", "q2"))
    intercept[IllegalArgumentException] { s.cut(Seq(1.0)) }
  }

  test("melt widens to long via Expand, unknown label raises KeyError") {
    val d = DataFrame.fromLocal(spark, Seq("id", "a", "b"),
      Seq(Seq[Any](1, 10.0, 100.0), Seq[Any](2, 20.0, 200.0)))
    val m = d.melt(Seq("id"), Seq("a", "b"))
    assert(m.len == 4)
    assert(m.columns.flatten.toSet == Set("id", "variable", "value"))
    val plan = m.frame.df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"expected Expand:\n$plan")
    intercept[graft.core.GraftKeyError] { d.melt(Seq("id"), Seq("nope")) }
  }

  test("explode emits one row per array element with 0-based position") {
    val e = DataFrame.fromParquet(spark, s"$dir/embeddings.parquet")
    val ex = e.explode("embedding")
    val expected = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("embedding")))).collect()(0).getLong(0)
    assert(ex.len == expected)
    assert(ex.columns.flatten.contains("pos") && ex.columns.flatten.contains("element"))
  }

  test("describe summarizes numeric columns") {
    val o = DataFrame.fromParquet(spark, s"$dir/orders.parquet",
      columns = Seq("o_totalprice"))
    val d = o.describe().toSpark().collect()
    assert(d.length == 5)
    val stats = d.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats("count").toLong == 1500)
    assert(stats("min").toDouble <= stats("max").toDouble)
  }

  test("column-axis reductions: df.sum/mean/min/max → Series over labels") {
    val d = DataFrame.fromLocal(spark, Seq("a", "b"),
      Seq(Seq[Any](1.0, 10.0), Seq[Any](2.0, 20.0), Seq[Any](3.0, 30.0)))
    val s = d.sum()
    assert(s.collectItems().toMap == Map("a" -> 6.0, "b" -> 60.0))
    assert(d.mean().collectItems().toMap == Map("a" -> 2.0, "b" -> 20.0))
    assert(d.min().collectItems().toMap == Map("a" -> 1.0, "b" -> 10.0))
    assert(d.max().collectItems().toMap == Map("a" -> 3.0, "b" -> 30.0))
    assert(d.countNonNull().collectItems().toMap == Map("a" -> 3L, "b" -> 3L))
  }

  test("idxmax/idxmin return the index value of the extreme element") {
    val s = graft.api.Series.fromLocal(spark,
      Seq(10L -> 5.0, 20L -> 9.0, 30L -> 1.0))
    assert(s.idxmax() == 20L)
    assert(s.idxmin() == 30L)
    val e = intercept[graft.core.GraftValueError](
      graft.api.Series.fromList(spark, Nil).idxmax())
    assert(e.getMessage.contains("empty"))
  }

  test("corr/cov between columns") {
    val d = DataFrame.fromLocal(spark, Seq("x", "y"),
      Seq(Seq[Any](1.0, 2.0), Seq[Any](2.0, 4.0), Seq[Any](3.0, 6.0)))
    assert(math.abs(d.corr("x", "y") - 1.0) < 1e-12)
    assert(math.abs(d.cov("x", "y") - 2.0) < 1e-12)
    intercept[graft.core.GraftKeyError](d.corr("x", "nope"))
  }

  test("whereValues/maskValues keep shape; corrMatrix engine-exact") {
    val d = DataFrame.fromLocal(spark, Seq("x", "y"),
      Seq(Seq[Any](1.0, 10.0), Seq[Any](2.0, 20.0), Seq[Any](3.0, 30.0)))
    val m = d("x").le(2.0)
    val w = d.whereValues(m, 0.0)
    assert(w.len == 3) // shape preserved, unlike where()
    val vals = w.toSpark(includeIndex = false).orderBy("x").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(vals == Seq((0.0, 0.0), (1.0, 10.0), (2.0, 20.0)))
    val mk = d.maskValues(m).toSpark(includeIndex = false)
      .orderBy("y").collect().map(r => r.isNullAt(0)).toSeq
    assert(mk == Seq(true, true, false))
    // y = 10x exactly → corr 1.0 bit-exact from the decimal power sums
    val c = d.corrMatrix().toSpark(includeIndex = false).collect()
    assert(c.length == 1 && c.head.getString(0) == "x" &&
      c.head.getDouble(2) == 1.0)
  }

  test("rollupAgg/cubeAgg: subtotal rows with NULL keys; pNN percentiles") {
    val d = DataFrame.fromLocal(spark, Seq("k", "g", "v"),
      Seq(Seq[Any]("a", "x", 1.0), Seq[Any]("a", "y", 3.0), Seq[Any]("b", "x", 5.0)))
    val r = d.groupby(Seq("k", "g")).rollupAgg(("v", "sum", "s"))
      .toSpark(includeIndex = false).collect()
    assert(r.length == 3 + 2 + 1) // leaves + per-k subtotals + grand total
    val grand = r.filter(x => x.isNullAt(0) && x.isNullAt(1))
    assert(grand.length == 1 && grand.head.getDouble(2) == 9.0)
    val c = d.groupby(Seq("k", "g")).cubeAgg(("v", "sum", "s"))
      .toSpark(includeIndex = false).collect()
    assert(c.length == 3 + 2 + 2 + 1) // + per-g subtotals
    // grouped exact percentile via pNN spec
    val q = d.groupby(Seq("k")).agg(("v", "p50", "med"))
      .toSpark(includeIndex = true).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(q == Map("a" -> 2.0, "b" -> 5.0))
    intercept[graft.core.GraftValueError](
      d.groupby(Seq("k")).agg(("v", "p999", "x")))
  }

  test("get_dummies: one-hot with explicit categories, source col dropped") {
    val d = DataFrame.fromLocal(spark, Seq("st", "x"),
      Seq(Seq[Any]("O", 1.0), Seq[Any]("F", 2.0), Seq[Any](null, 3.0)))
    val out = d.getDummies("st", Seq("O", "F"), Some("s"))
    assert(out.columns.map(_.orNull) == Seq("x", "s_O", "s_F"))
    val rows = out.toSpark(includeIndex = false).orderBy("x").collect()
      .map(r => (r.getInt(1), r.getInt(2))).toSeq
    assert(rows == Seq((1, 0), (0, 1), (0, 0))) // null row → all zeros
    intercept[graft.core.GraftKeyError](d.getDummies("nope", Seq("a")))
  }

  test("fillna / dropna") {
    val d = DataFrame.fromLocal(spark, Seq("x"), Seq(Seq(1.0), Seq(null), Seq(3.0)))
    assert(d.dropna().len == 2)
    assert(d.fillna(0.0).frame.df.orderBy("__idx_0").collect().map(_.get(1)).toSeq ==
      Seq(1.0, 0.0, 3.0))
    // unknown subset label → KeyError (like select), not a raw index error
    val e = intercept[graft.core.GraftKeyError](d.dropna(subset = Seq("nope")))
    assert(e.getMessage.contains("nope"))
  }
}
