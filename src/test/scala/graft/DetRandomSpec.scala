package graft

import graft.operators.DetRandom
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic randomness: md5-derived uniforms, the scalable dense
  * index (bijection, partition-invariance), negative sampling contract. */
class DetRandomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("md5Long48 folds the first 12 md5 hex digits, exactly") {
    val got = Seq("5", "abc").toDF("k")
      .select(col("k"), DetRandom.md5Long48(col("k")).as("v"))
      .as[(String, Long)].collect().toMap
    def ref(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(12), 16)
    }
    assert(got("5") == ref("5") && got("abc") == ref("abc"))
    // uniformMod lands in [0, n) and is reproducible
    val m = Seq.fill(2)(
      (1L to 50L).toDF("id")
        .select(DetRandom.uniformMod(col("id"), lit(7L)).as("u"))
        .as[Long].collect().toSeq)
    assert(m(0) == m(1) && m(0).forall(u => u >= 0 && u < 7))
  }

  test("denseIndex is a 0..N-1 bijection, partition-invariant, no global sort") {
    val df = (1L to 500L).map(i => i * 3).toDF("id")
    val ix = DetRandom.denseIndex(df, "id", buckets = 16)
    val idxs = ix.select("idx").as[Long].collect().sorted
    assert(idxs.toSeq == (0L until 500L).toSeq)
    val again = DetRandom.denseIndex(df.repartition(13), "id", buckets = 16)
      .orderBy("id").select("idx").as[Long].collect().toSeq
    assert(again == ix.orderBy("id").select("idx").as[Long].collect().toSeq)
    // scalability shape: the data-side window is keyed by the md5
    // bucket (16 groups here), never a global order — only the 16-row
    // offsets relation sees a single-partition window
    val plan = ix.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__b"), plan)
  }

  test("negativeSample: <=k per anchor, corpus members, self and positives excluded") {
    val corpus = (1L to 200L).toDF("id")
    val anchors = Seq(5L, 50L, 150L).toDF("aid")
    val neg = DetRandom.negativeSample(corpus, "id", anchors, "aid", k = 6)
      .as[(Long, Int, Long)].collect().toSeq
    val byAnchor = neg.groupBy(_._1)
    assert(byAnchor.keySet == Set(5L, 50L, 150L))
    byAnchor.values.foreach(v => assert(v.size <= 6 && v.size >= 4))
    assert(neg.forall { case (a, _, n) => n != a && n >= 1 && n <= 200 })
    // reruns are bit-identical
    val neg2 = DetRandom.negativeSample(corpus, "id", anchors, "aid", k = 6)
      .as[(Long, Int, Long)].collect().toSeq
    assert(neg.sorted == neg2.sorted)
    // positives are excluded
    val pos = neg.take(2).map { case (a, _, n) => (a, n) }.toDF("a", "p")
    val filtered = DetRandom.negativeSample(corpus, "id", anchors, "aid", k = 6,
        positives = Some((pos, "a", "p")))
      .as[(Long, Int, Long)].collect().toSeq
    val excluded = neg.take(2).map { case (a, _, n) => (a, n) }.toSet
    assert(filtered.forall { case (a, _, n) => !excluded.contains((a, n)) })
  }
}
