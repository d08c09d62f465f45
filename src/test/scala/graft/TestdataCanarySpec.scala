package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift canary over the driver-generated testdata.
  *
  * Round 5 lost 13 queries and 2 specs to a SILENT input change (the
  * driver regenerated events.parquet with ts as timestamp[us] where it
  * had been timestamp[ns]) — every failure surfaced far downstream as a
  * DATATYPE_MISMATCH or a 1970-era window. This spec pins, in ONE
  * targeted place, the physical contract of every testdata column the
  * engine does arithmetic on, and the magnitude of the normalized time
  * base, so the next vintage change fails HERE with the drifted column
  * named.
  */
class TestdataCanarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def schemaOf(table: String) =
    spark.read.parquet(s"$dir/$table.parquet").schema

  test("canary: events column types (ts vintage must be a known shape)") {
    val s = schemaOf("events")
    assert(s("event_id").dataType == LongType, s"events.event_id drifted: ${s("event_id").dataType}")
    assert(s("user_id").dataType == LongType, s"events.user_id drifted: ${s("user_id").dataType}")
    assert(s("event_type").dataType == StringType, s"events.event_type drifted: ${s("event_type").dataType}")
    assert(s("value").dataType == DoubleType, s"events.value drifted: ${s("value").dataType}")
    assert(s("props").dataType == StringType, s"events.props drifted: ${s("props").dataType}")
    val tsT = s("ts").dataType
    assert(tsT == LongType || tsT == TimestampType || tsT == TimestampNTZType,
      s"events.ts drifted to $tsT — the ONE read-boundary seam " +
        "(GraftStreaming.tsToEpochNs, shared by batch and streaming) " +
        "only handles ns-long and timestamp vintages; teach it this one")
  }

  test("canary: normalized events.ts is epoch NANOSECONDS of a sane era") {
    // both normalization seams (batch + streaming share the logic via
    // GraftStreaming.normalizeTs) must yield 2020s-era epoch-ns longs;
    // a seconds/ms/us-scale value here means a unit bug, a 1970-era
    // value means a vintage mismatch
    val norm = graft.streaming.GraftStreaming.normalizeTs(
      spark.read.parquet(s"$dir/events.parquet"))
    assert(norm.schema("ts").dataType == LongType)
    val r = norm.agg(min("ts"), max("ts"), min("event_time"), max("event_time"))
      .collect()(0)
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    // 2015-01-01 .. 2040-01-01 in epoch ns
    assert(lo > 1.42e18.toLong && hi < 2.21e18.toLong,
      s"normalized events.ts out of era: min=$lo max=$hi (epoch-ns expected)")
    val loT = r.getTimestamp(2).toInstant.getEpochSecond
    assert(loT > 1.42e9.toLong, s"event_time in the wrong era: ${r.getTimestamp(2)}")
  }

  test("canary: arithmetic columns of the other tables") {
    val li = schemaOf("lineitem")
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      assert(li(c).dataType == DoubleType, s"lineitem.$c drifted: ${li(c).dataType}")
    assert(li("l_orderkey").dataType == LongType)
    // dt-accessor columns: any timestamp flavor works (no integer math on them)
    assert(Seq(TimestampType, TimestampNTZType, DateType).contains(li("l_shipdate").dataType),
      s"lineitem.l_shipdate drifted: ${li("l_shipdate").dataType}")
    val o = schemaOf("orders")
    assert(o("o_totalprice").dataType == DoubleType, s"orders.o_totalprice drifted: ${o("o_totalprice").dataType}")
    assert(Seq(TimestampType, TimestampNTZType, DateType).contains(o("o_orderdate").dataType),
      s"orders.o_orderdate drifted: ${o("o_orderdate").dataType}")
    val d = schemaOf("documents")
    assert(d("doc_id").dataType == LongType, s"documents.doc_id drifted: ${d("doc_id").dataType}")
    assert(d("text").dataType == StringType, s"documents.text drifted: ${d("text").dataType}")
    assert(d("n_chars").dataType == LongType, s"documents.n_chars drifted: ${d("n_chars").dataType}")
    val e = schemaOf("embeddings")
    assert(e("vec_id").dataType == LongType, s"embeddings.vec_id drifted: ${e("vec_id").dataType}")
    assert(e("embedding").dataType == ArrayType(DoubleType, true) ||
      e("embedding").dataType == ArrayType(DoubleType, false) ||
      e("embedding").dataType == ArrayType(FloatType, true) ||
      e("embedding").dataType == ArrayType(FloatType, false),
      s"embeddings.embedding drifted: ${e("embedding").dataType}")
  }
}
