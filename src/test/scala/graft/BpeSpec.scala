package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE vocabulary induction: word table shape, literal pair counts,
  * leftmost-non-overlapping merge application, and a full merge round. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("initBpeWords: distinct lower-cased words with freq and char syms") {
    val docs = Seq("aa AA ab", "aa x").toDF("text")   // "x" too short
    val rows = TextAnalysis.initBpeWords(docs, "text")
      .orderBy("w").as[(String, Long, Seq[String])].collect().toSeq
    assert(rows == Seq(("aa", 3L, Seq("a", "a")), ("ab", 1L, Seq("a", "b"))))
  }

  test("bpePairStats: corpus-frequency-weighted adjacent pair counts") {
    val docs = Seq("aa aa ab").toDF("text")
    val stats = TextAnalysis.bpePairStats(
        TextAnalysis.initBpeWords(docs, "text"))
      .orderBy("pair").as[(String, Long)].collect().toSeq
    assert(stats == Seq(("aa", 2L), ("ab", 1L)))
  }

  test("applyBpeMerge: leftmost-first, non-overlapping, quote-safe") {
    val words = Seq(("banana", 1L, Seq("b", "a", "n", "a", "n", "a")),
      ("aaa", 1L, Seq("a", "a", "a"))).toDF("w", "freq", "syms")
    val merged = TextAnalysis.applyBpeMerge(words, "a", "n")
      .orderBy("w").select("syms").as[Seq[String]].collect().toSeq
    assert(merged == Seq(Seq("a", "a", "a"), Seq("b", "an", "an", "a")))
    // overlapping runs merge non-overlapping from the left: aaa -> [aa, a]
    val runs = TextAnalysis.applyBpeMerge(words, "a", "a")
      .where(col("w") === "aaa").select("syms").as[Seq[String]].collect()
    assert(runs.head == Seq("aa", "a"))
    // symbols containing quotes don't break the fold expression
    val quoted = Seq(("it's", 1L, Seq("i", "t", "'", "s"))).toDF("w", "freq", "syms")
    assert(TextAnalysis.applyBpeMerge(quoted, "'", "s")
      .select("syms").as[Seq[String]].collect().head == Seq("i", "t", "'s"))
  }

  test("bpeEncode: merges apply in order, word boundaries block merges") {
    val merges = Seq("t" -> "h", "th" -> "e", "l" -> "l")
    val docs = Seq((1L, "The theme"), (2L, "hello lll"), (3L, ""),
      (4L, "a|b t h")).toDF("id", "text")
    val got = docs.select(col("id"),
        TextAnalysis.bpeEncode(col("text"), merges).as("toks"))
      .orderBy("id").as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("the", "the", "m", "e"))       // th+e inside "theme"
    // "lll": leftmost non-overlapping -> ll + l; boundary keeps words apart
    assert(got(2L) == Seq("h", "e", "ll", "o", "ll", "l"))
    assert(got(3L) == Seq.empty)                          // no words -> no tokens
    // '|' stripped ("a|b" -> "ab"); "t h" split across words never merges
    assert(got(4L) == Seq("a", "b", "t", "h"))
  }

  test("bpeEncodeViaVocab: identical to per-doc bpeEncode on real docs") {
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
      "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(60)
    val direct = docs.select(col("doc_id"),
        TextAnalysis.bpeEncode(col("text"), merges).as("tokens"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    val vocab = TextAnalysis.bpeEncodeViaVocab(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(vocab == direct)
    assert(direct.exists(_._2.nonEmpty))
  }

  test("a full merge round: apply the top pair, pair stats shift") {
    val docs = Seq("the the the that").toDF("text")
    val words = TextAnalysis.initBpeWords(docs, "text")
    val top = TextAnalysis.bpePairStats(words)
      .orderBy(desc("cnt"), col("pair")).limit(1)
      .as[(String, Long)].collect().head
    assert(top == ("th", 4L))                 // th in 3x the + 1x that
    val after = TextAnalysis.bpePairStats(
        TextAnalysis.applyBpeMerge(words, "t", "h"))
      .orderBy(desc("cnt"), col("pair")).as[(String, Long)].collect().toSeq
    assert(after.head == ("the", 3L))         // th+e now dominates
    assert(!after.map(_._1).contains("th"))   // the raw pair is consumed
  }
}
