package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property parity for the hand-rolled byte kernels against the
  * declarative Spark forms they replaced: random whitespace-heavy
  * unicode strings, one DataFrame round trip per property (each row is a
  * case). Raw ScalaCheck generators with fixed seeds (the scalatestplus
  * bridge is not in the offline cache). */
class KernelPropSpec extends AnyFunSuite {

  test("luhn kernel ≡ arithmetic reference on random digit strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def reference(s: String): Boolean =
      s.length >= 2 && s.forall(_.isDigit) && {
        val digits = s.reverse.map(_ - '0')
        digits.zipWithIndex.map { case (d, i) =>
          if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
        }.sum % 10 == 0
      }
    val gen = Gen.frequency(
      8 -> Gen.choose(1, 22).flatMap(n =>
        Gen.listOfN(n, Gen.numChar).map(_.mkString)),
      2 -> Gen.asciiPrintableStr)
    (0 until 400).foreach { i =>
      val s = gen(Gen.Parameters.default, Seed(i.toLong)).get
      val got = graft.functions.LuhnCheck.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(got == reference(s), s"luhn mismatch on '$s'")
    }
    // ~1 in 10 random runs validate: sanity the discrimination rate
    // (a LINEAR digit pattern is NOT random enough here — its Luhn sum
    // is constant mod 10 and can sit at a permanent miss)
    val rnd = new scala.util.Random(42)
    val valids = (0 until 1000).count { _ =>
      val s = (0 until 16).map(_ => ('0' + rnd.nextInt(10)).toChar).mkString
      graft.functions.LuhnCheck.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
    }
    assert(valids > 20 && valids < 300, s"implausible pass rate $valids/1000")
  }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // whitespace-dense alphabet with multi-byte chars and regex metachars
  private val alphabet: Gen[Char] = Gen.frequency(
    6 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', ''),
    10 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('Ä', 'ß', 'ü', 'Ω', '日', '本', 'λ'),
    2 -> Gen.oneOf('.', '*', '(', ')', '[', '\\', '#'))

  private val texts: Seq[String] = {
    val g = Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, alphabet))
    (0 until 300).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
  }

  test("WordShingles ≡ HOF transform/slice form on random unicode text") {
    def hofAll(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = TextAnalysis.tokens(text)
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", toks)))
    }
    val df = texts.toDF("text")
    for (n <- Seq(1, 2, 4)) {
      val bad = df.select(
          Dedup.shinglesAll(col("text"), n).as("k"),
          hofAll(col("text"), n).as("h"),
          Dedup.shingles(col("text"), n).as("kd"),
          array_distinct(hofAll(col("text"), n)).as("hd"))
        .where(col("k") =!= col("h") || col("kd") =!= col("hd"))
      assert(bad.count() == 0, s"kernel/HOF divergence at n=$n")
    }
  }

  test("stripBoilerplateLines invariants on random multi-line corpora") {
    // random docs assembled from a small line pool (so hub lines exist)
    // plus unique lines; invariants: n_kept + n_removed = n_lines, kept
    // lines are an ordered subsequence of the original, no kept line's
    // trim-fingerprint exceeds the cap, every doc with a surviving line
    // appears
    val pool = Seq("shared header", "  shared header  ", "nav", "footer txt")
    val lineGen = Gen.frequency(
      3 -> Gen.oneOf(pool),
      2 -> Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)))
    val docGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, lineGen))
    val docs = (0 until 120).flatMap(i =>
      docGen.apply(Gen.Parameters.default, Seed(99L + i)).map(ls =>
        (i.toLong, ls.mkString("\n"))))
    val df = docs.toDF("doc_id", "text")
    val maxDocs = 20L
    val out = Dedup.stripBoilerplateLines(df, "doc_id", "text", maxDocs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // recompute the hub set independently
    val freq = docs.flatMap { case (id, t) =>
      t.split("\n", -1).map(_.trim).distinct.map(_ -> id)
    }.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val hub = freq.filter(_._2 > maxDocs).keySet
    docs.foreach { case (id, t) =>
      val lines = t.split("\n", -1).toSeq
      val keptExpected = lines.filter(l => !hub.contains(l.trim))
      if (keptExpected.isEmpty) assert(!out.contains(id))
      else {
        val (nl, nk, nr, clean) = out(id)
        assert(nl == lines.size && nk == keptExpected.size && nk + nr == nl)
        assert(clean == keptExpected.mkString("\n"), s"doc $id order/bytes")
      }
    }
  }

  test("StopwordHits ≡ per-list HOF split/filter counts on random text") {
    import graft.operators.LangId
    def hofHits(text: org.apache.spark.sql.Column, words: Seq[String]) = {
      val toks = filter(split(lower(text), "\\W+"), t => length(t) > 0)
      size(filter(toks, t => array_contains(typedlit(words), t)))
    }
    def hofTotal(text: org.apache.spark.sql.Column) =
      size(filter(split(lower(text), "\\W+"), t => length(t) > 0))
    val lists = LangId.profiles.map(_._2)
    val kernel = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.StopwordHits(
        org.apache.spark.sql.GraftSqlBridge.expression(col("text")), lists))
    // seed the corpus with real stopwords so hits are non-trivial
    val seeded = texts ++ Seq("the and of la le der", "el que de los THE und")
    val df = seeded.toDF("text")
    val bad = df.select(kernel.as("k"),
        array((lists.map(ws => hofHits(col("text"), ws)) :+
          hofTotal(col("text"))): _*).as("h"))
      .where(col("k") =!= col("h"))
    assert(bad.count() == 0, "kernel/HOF divergence: " +
      bad.take(3).map(_.toString).mkString("; "))
  }

  test("NormalizeWs ≡ regexp_replace(lower(trim(.)), '\\s+', ' ') on random text") {
    val df = texts.toDF("text")
    val bad = df.select(col("text"),
        TextAnalysis.normalizeWs(col("text")).as("k"),
        regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("r"))
      .where(col("k") =!= col("r"))
    assert(bad.count() == 0, "kernel/regex divergence: " +
      bad.take(3).map(_.toString).mkString("; "))
  }

  test("JaroWinkler kernel invariants on random string pairs") {
    // independent scalar reference (textbook formulation, collections
    // instead of the kernel's scratch arrays) + structural invariants
    def refJaro(a: String, b: String): Double = {
      if (a.isEmpty || b.isEmpty) return 0.0
      val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
      val bUsed = collection.mutable.Set.empty[Int]
      val pairs = a.zipWithIndex.flatMap { case (c, i) =>
        ((i - window) to (i + window))
          .find(j => j >= 0 && j < b.length && !bUsed(j) && b(j) == c)
          .map { j => bUsed += j; (i, j) }
      }
      if (pairs.isEmpty) return 0.0
      val m = pairs.size.toDouble
      // both sequences ordered by their own index; count misaligned chars
      val t = pairs.map(_._1).map(a(_))
        .zip(pairs.sortBy(_._2).map(_._2).map(b(_)))
        .count { case (x, y) => x != y } / 2
      (m / a.length + m / b.length + (m - t) / m) / 3.0
    }
    def refJw(a: String, b: String): Double = {
      val j = refJaro(a, b)
      if (j <= 0.7) j
      else {
        val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
        j + l * 0.1 * (1.0 - j)
      }
    }
    val strGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'ü', '日')))
    val pairs = (0 until 400).flatMap { i =>
      for {
        a <- strGen(Gen.Parameters.default, Seed(31L + i))
        b <- strGen(Gen.Parameters.default, Seed(1031L + i))
      } yield (a, b)
    } ++ Seq(("", ""), ("a", ""), ("abc", "abc"), ("ab", "ba"))
    val df = pairs.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        graft.functions.JaroWinkler.jaro(col("a"), col("b")).as("j"),
        graft.functions.JaroWinkler.jaro(col("b"), col("a")).as("js"),
        graft.functions.JaroWinkler.jaroWinkler(col("a"), col("b")).as("w"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (j, js, w) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(j - refJaro(a, b)) < 1e-12, s"jaro('$a','$b')")
      assert(j == js, s"symmetry('$a','$b')")
      assert(j >= 0.0 && j <= 1.0 && w >= 0.0 && w <= 1.0, s"bounds('$a','$b')")
      assert(w >= j, s"winkler >= jaro ('$a','$b')")
      if (j <= 0.7) assert(w == j, s"no boost below 0.7 ('$a','$b')")
      if (a.nonEmpty && a == b) assert(j == 1.0 && w == 1.0)
      assert(math.abs(w - refJw(a, b)) < 1e-12, s"jw('$a','$b')")
    }
  }
}
