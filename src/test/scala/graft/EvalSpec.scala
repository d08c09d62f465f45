package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Eval

/** Hand-computed cases for the evaluation-metric family: exact
  * Mann-Whitney AUC (ties, degenerate classes), retrieval ranking
  * metrics (MRR/P@k/R@k/AP/NDCG@k against by-hand quantized sums),
  * Cohen's kappa (the textbook 2×2), and ROUGE-N (clipped multiset
  * counts, short-text fallback, empties). */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aucRoc: ties average-rank; known 11/12 case") {
    val df = Seq((0.1, false), (0.2, false), (0.3, true), (0.3, false),
      (0.4, true)).toDF("score", "label")
    val r = Eval.aucRoc(df, "score", "label").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 11.0 / 12.0)
  }

  test("aucRoc: perfect separation is 1.0, reversed is 0.0") {
    val good = Seq((0.9, true), (0.1, false)).toDF("score", "label")
    assert(Eval.aucRoc(good, "score", "label").collect().head.getDouble(2) == 1.0)
    val bad = Seq((0.1, true), (0.9, false)).toDF("score", "label")
    assert(Eval.aucRoc(bad, "score", "label").collect().head.getDouble(2) == 0.0)
  }

  test("aucRoc: single-class input yields NULL auc; NULLs excluded") {
    val onlyPos = Seq((0.5, true), (0.7, true)).toDF("score", "label")
    val r = Eval.aucRoc(onlyPos, "score", "label").collect().head
    assert(r.isNullAt(2))
    val withNulls = Seq((Some(0.9), Some(true)), (Some(0.1), Some(false)),
      (None, Some(true)), (Some(0.5), None))
      .toDF("score", "label")
    val r2 = Eval.aucRoc(withNulls, "score", "label").collect().head
    assert(r2.getLong(0) == 1 && r2.getLong(1) == 1 && r2.getDouble(2) == 1.0)
  }

  test("prAuc: step-wise average precision, by-hand cases") {
    // perfect ranking
    val good = Seq((0.9, true), (0.1, false)).toDF("score", "label")
    assert(Eval.prAuc(good, "score", "label").collect().head.getDouble(2) == 1.0)
    // interleaved: terms floor(1e9*1*1/1) + floor(1e9*2/3) over 2e9
    val mix = Seq((0.9, true), (0.8, false), (0.7, true))
      .toDF("score", "label")
    val expected = (1000000000L + 666666666L) / (1e9 * 2)
    assert(Eval.prAuc(mix, "score", "label").collect().head.getDouble(2)
      == expected)
    // tie at one threshold: pos and neg share the score
    val tie = Seq((0.5, true), (0.5, false)).toDF("score", "label")
    assert(Eval.prAuc(tie, "score", "label").collect().head.getDouble(2) == 0.5)
    // no positives -> NULL
    val neg = Seq((0.5, false)).toDF("score", "label")
    assert(Eval.prAuc(neg, "score", "label").collect().head.isNullAt(2))
  }

  test("bleuCorpus: prefix pair with brevity penalty, by-hand") {
    val pairs = Seq((1L, "the cat sat on the", "the cat sat on the mat"))
      .toDF("id", "cand", "ref")
    val r = Eval.bleuCorpus(pairs, "id", "cand", "ref", maxN = 4)
      .collect().head
    assert(r.getAs[Long]("cand_tokens") == 5 && r.getAs[Long]("ref_tokens") == 6)
    // every cand n-gram appears in ref (clipped): p1..p4 all 1
    (1 to 4).foreach(n => assert(r.getAs[Double](s"p$n") == 1.0, s"p$n"))
    val bp = math.exp(1.0 - 6.0 / 5.0)
    assert(r.getAs[Double]("bp") == bp)
    assert(r.getAs[Double]("bleu") == bp) // geometric mean of ones
  }

  test("bleuCorpus: zero 4-gram overlap zeroes BLEU; p1 still counts") {
    val pairs = Seq((1L, "x a b c", "a b c y")).toDF("id", "cand", "ref")
    val r = Eval.bleuCorpus(pairs, "id", "cand", "ref", maxN = 4)
      .collect().head
    assert(r.getAs[Double]("p1") == 0.75)
    assert(r.getAs[Double]("bleu") == 0.0)
    // equal lengths -> no brevity penalty
    assert(r.getAs[Double]("bp") == 1.0)
  }

  test("rankingMetrics: four-doc single query, k=2, by-hand sums") {
    val df = Seq(("q1", "d1", 0.9, 1), ("q1", "d2", 0.8, 0),
      ("q1", "d3", 0.7, 1), ("q1", "d4", 0.6, 0))
      .toDF("q", "d", "sc", "rel")
    val r = Eval.rankingMetrics(df, "q", "d", "sc", "rel", k = 2)
      .collect().head
    assert(r.getAs[Long]("n_docs") == 4 && r.getAs[Long]("n_rel") == 2)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(r.getAs[Double]("precision_at_k") == 0.5)
    assert(r.getAs[Double]("recall_at_k") == 0.5)
    // AP terms: floor(1e9*1/1) + floor(1e9*2/3), over 1e9 * n_rel
    val apNum = 1000000000L + 666666666L
    assert(r.getAs[Double]("avg_precision") == apNum / (1e9 * 2))
    // DCG@2 = gain 1 at rank 1; ideal puts the two rels at ranks 1, 2
    val idcg = 1000000000L +
      math.floor(1e9 / (math.log(3) / math.log(2))).toLong
    assert(r.getAs[Double]("ndcg_at_k") == 1000000000L.toDouble / idcg)
  }

  test("rankingMetrics: no relevant docs zeroes the rates; ties broken by doc") {
    val df = Seq(("q1", "d1", 0.5, 0), ("q1", "d2", 0.5, 0),
      ("q2", "d1", 0.5, 0), ("q2", "d2", 0.5, 1))
      .toDF("q", "d", "sc", "rel")
    val rows = Eval.rankingMetrics(df, "q", "d", "sc", "rel", k = 1)
      .orderBy("query").collect()
    val q1 = rows(0)
    assert(q1.getAs[Double]("mrr") == 0.0 &&
      q1.getAs[Double]("recall_at_k") == 0.0 &&
      q1.getAs[Double]("avg_precision") == 0.0 &&
      q1.getAs[Double]("ndcg_at_k") == 0.0)
    // q2: tie on score, doc asc puts d1 first → relevant d2 at rank 2
    val q2 = rows(1)
    assert(q2.getAs[Double]("mrr") == 0.5)
    assert(q2.getAs[Double]("precision_at_k") == 0.0)
  }

  test("cohenKappa: textbook 2x2 gives 0.4 exactly") {
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    assert(r.getAs[Long]("n") == 50)
    assert(r.getAs[Double]("observed_agreement") == 0.7)
    assert(r.getAs[Double]("expected_agreement") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
  }

  test("cohenKappa: perfect single-class agreement is undefined (NULL)") {
    val r = Eval.cohenKappa(Seq(("x", "x"), ("x", "x")).toDF("a", "b"),
      "a", "b").collect().head
    assert(r.getAs[Double]("observed_agreement") == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("rougeN: bigram case with clipping and fallback") {
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat on the mat"),
      (2L, "hello", "hello"), // short-text fallback: whole text
      (3L, "", "x y")) // empty cand → one empty gram, zero overlap
      .toDF("id", "cand", "ref")
    val m = Eval.rougeN(pairs, "id", "cand", "ref", n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val p1 = m(1L)
    assert(p1.getAs[Long]("overlap") == 3 &&
      p1.getAs[Long]("cand_ngrams") == 5 && p1.getAs[Long]("ref_ngrams") == 4)
    assert(p1.getAs[Double]("rouge_precision") == 0.6)
    assert(p1.getAs[Double]("rouge_recall") == 0.75)
    assert(p1.getAs[Double]("rouge_f1") == 6.0 / 9.0)
    assert(m(2L).getAs[Double]("rouge_f1") == 1.0)
    assert(m(3L).getAs[Double]("rouge_f1") == 0.0)
  }

  test("naive Bayes: add-one arithmetic by hand; unseen tokens take the default") {
    import graft.operators.TextAnalysis
    val tr = Seq(("spam", "buy pills buy"), ("ham", "hello world hello"))
      .toDF("label", "text")
    val te = Seq((1L, "buy buy"), (2L, "hello hello world"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.nbTrain(tr, "label", "text")
    val pred = TextAnalysis.nbClassify(te, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(pred(1L)._1 == "spam" && pred(2L)._1 == "ham")
    assert(pred(1L)._2 == 2 && pred(2L)._2 == 3)
    // by-hand: V=4; spam T=3 (buy:2, pills:1), priors ln(1/2)
    // "buy buy" under spam: floor(1e9*ln(.5)) + 2*floor(1e9*ln(3/7))
    val spamScore = (math.floor(1e9 * math.log(0.5)).toLong +
      2 * math.floor(1e9 * math.log(3.0 / 7.0)).toLong) / 1e9
    assert(pred(1L)._3 == spamScore)
  }

  test("naive Bayes: exact tie breaks to the min label") {
    import graft.operators.TextAnalysis
    val tr = Seq(("a", "x"), ("b", "x")).toDF("label", "text")
    val te = Seq((1L, "x x")).toDF("doc_id", "text")
    val model = TextAnalysis.nbTrain(tr, "label", "text")
    val r = TextAnalysis.nbClassify(te, "doc_id", "text", model)
      .collect().head
    assert(r.getString(1) == "a")
  }

  test("fleissKappa: 3 items x 2 raters by hand = 1/3; balancing rule") {
    // i1 [a,a], i2 [a,b], i3 [b,b]: P1=1, P2=0, P3=1 -> p_bar=2/3;
    // marginals 3/3 -> p_e=1/2; kappa=1/3. Item 4 has ONE rating (drops);
    // item 5 has three (keeps the first 2 in order-col order: a,a)
    val df = Seq(
      (1L, "a", 1L), (1L, "a", 2L),
      (2L, "a", 1L), (2L, "b", 2L),
      (3L, "b", 1L), (3L, "b", 2L),
      (4L, "a", 1L),
      (5L, "a", 1L), (5L, "a", 2L), (5L, "b", 3L)
    ).toDF("item", "cat", "ord")
    val r = Eval.fleissKappa(df, "item", "cat", "ord", n = 2)
      .collect().head
    assert(r.getLong(0) == 4 && r.getInt(1) == 2)
    // with item 5 as [a,a]: p_bar = (1+0+1+1)/4 = 3/4; c_a=5, c_b=3
    // -> p_e = (25+9)/64 = 17/32; kappa = (3/4-17/32)/(1-17/32) = 7/15
    assert(r.getDouble(2) == 3.0 / 4.0)
    assert(r.getDouble(3) == 17.0 / 32.0)
    assert(math.abs(r.getDouble(4) - 7.0 / 15.0) < 1e-15)
  }

  test("fleissKappa: empty input yields one NULL-kappa row") {
    val df = Seq.empty[(Long, String, Long)].toDF("item", "cat", "ord")
    val r = Eval.fleissKappa(df, "item", "cat", "ord", n = 2)
      .collect().head
    assert(r.getLong(0) == 0 && r.isNullAt(2) && r.isNullAt(4))
  }

  test("chiSquareTokens: 2x2 cells by hand; zero-delta token ranks last") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "en", "apple apple"), (2L, "en", "banana"),
      (3L, "fr", "apple"), (4L, "fr", "cherry"))
      .toDF("doc_id", "lang", "text")
    val r = TextAnalysis.chiSquareTokens(docs, "doc_id", "lang", "text",
        minDf = 1L, topK = 5)
      .collect().map(x => (x.getString(0), x.getInt(1)) ->
        (x.getString(2), x.getLong(3), x.getDouble(4))).toMap
    // banana/en: a=1 ct=1 nl=2 N=4 -> delta=2, chi2=4*4/(1*3*2*2)=4/3
    assert(r(("en", 1))._1 == "banana")
    assert(math.abs(r(("en", 1))._3 - 4.0 / 3.0) < 1e-15)
    // apple appears once per label -> delta=0 -> chi2=0, ranked after
    assert(r(("en", 2)) == ("apple", 1L, 0.0))
    assert(r(("fr", 1))._1 == "cherry" && r(("fr", 2))._1 == "apple")
  }

  test("jsDivergence: hand-quantized two-corpus case; self-JSD is 0") {
    import graft.operators.TextAnalysis
    val a = Seq((1L, "x x y")).toDF("id", "text")
    val b = Seq((2L, "x z")).toDF("id", "text")
    val r = TextAnalysis.jsDivergence(a, b).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getLong(2) == 2)
    def q(t: Double) = math.floor(t * 1e9).toLong
    val px = 2.0 / 3.0; val qx = 1.0 / 2.0; val mx = (px + qx) / 2.0
    val py = 1.0 / 3.0; val my = (py + 0.0) / 2.0
    val qz = 1.0 / 2.0; val mz = (0.0 + qz) / 2.0
    val exp = (q(px * math.log(px / mx) + qx * math.log(qx / mx)) +
      q(py * math.log(py / my)) + q(qz * math.log(qz / mz))).toDouble / 2e9
    assert(r.getDouble(3) == exp)
    val self = TextAnalysis.jsDivergence(a, a).collect().head
    assert(self.getDouble(3) == 0.0)
  }

  test("kneserNeyScore: closed form by hand; unseen history and word") {
    import graft.operators.TextAnalysis
    // model "a b a b c": big ab:2 ba:1 bc:1; hist a(2,1) b(2,2);
    // cont a:1 b:1 c:1; nt=3, V=3 -> pcont denom 7
    val tr = Seq(Tuple1("a b a b c")).toDF("text")
    val te = Seq((1L, "a b c"), (2L, "x b"), (3L, "a z"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.kneserNeyScore(te, tr, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    def q(p: Double) = math.floor(math.log(p) * 1e9).toLong
    val p1 = math.max(2.0 - 0.75, 0.0) / 2.0 +
      0.75 * 1.0 / 2.0 * (2.0 / 7.0)              // p(b|a)
    val p2 = math.max(1.0 - 0.75, 0.0) / 2.0 +
      0.75 * 2.0 / 2.0 * (2.0 / 7.0)              // p(c|b)
    val s1 = (q(p1) + q(p2)).toDouble / 1e9
    assert(r(1L)._1 == 2 && r(1L)._2 == s1)
    assert(r(1L)._3 == math.exp(-(s1 / 2.0)))
    // unseen history x -> pure continuation 2/7
    assert(r(2L)._2 == q(2.0 / 7.0).toDouble / 1e9)
    // unseen word z under seen history a -> discounted mass * floor 1/7
    val p3 = 0.0 / 2.0 + 0.75 * 1.0 / 2.0 * (1.0 / 7.0)
    assert(r(3L)._2 == q(p3).toDouble / 1e9)
  }

  test("splitConformal: by-hand rank threshold, coverage and set size") {
    // cal nonconformities: 0 (x1), 0.25 (x2), 0.5 (x1); n=4, alpha=0.25
    // -> k = ceil(0.75*5) = 4 -> qhat = 0.5
    val cal = Seq((1.0, true), (0.75, true), (0.25, false), (0.5, false))
      .toDF("score", "label")
    val ev = Seq((1.0, true), (0.0, false), (0.75, false))
      .toDF("score", "label")
    val r = Eval.splitConformal(cal, ev, "score", "label", alpha = 0.25)
      .collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.5)
    assert(r.getLong(3) == 3)
    assert(r.getDouble(4) == 2.0 / 3.0)   // a = 0, 0, 0.75
    assert(r.getDouble(5) == 1.0)         // sets: {1},{0},{1} -> 3/3
  }

  test("confidentJointBinary: thresholds by hand; off-diagonal flags the error") {
    // t1 = mean(1.0, 0.5) = 0.75; t0 = mean(1, 0.5, q(0.1)) = 0.533…
    // (0.9, false) clears t1 only -> assigned 1: a label-error cell
    val df = Seq((1.0, true), (0.5, true),
      (0.0, false), (0.5, false), (0.9, false)).toDF("score", "label")
    val r = Eval.confidentJointBinary(df, "score", "label")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(r == Map((1L, 1L) -> 1L, (0L, 0L) -> 1L, (0L, 1L) -> 1L))
  }

  test("rougeN: multiset clipping (unigram 'a a a' vs 'a a')") {
    val r = Eval.rougeN(Seq((1L, "a a a", "a a")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", n = 1).collect().head
    assert(r.getAs[Long]("overlap") == 2)
    assert(r.getAs[Double]("rouge_precision") == 2.0 / 3.0)
    assert(r.getAs[Double]("rouge_recall") == 1.0)
    assert(r.getAs[Double]("rouge_f1") == 0.8)
  }

  test("krippendorffAlpha: by-hand nominal case; perfect, degenerate, ragged") {
    import graft.operators.Eval
    // perfect agreement, 2 raters × 2 items → alpha = 1
    val perfect = Seq((1, "x"), (1, "x"), (2, "y"), (2, "y")).toDF("i", "c")
    val p = Eval.krippendorffAlpha(perfect, "i", "c").collect().head
    assert(p.getAs[Long]("n") == 4 && p.getAs[Long]("n_items") == 2)
    assert(p.getAs[Double]("alpha") == 1.0)
    // the textbook 2-rater binary case: items (x,x), (x,y), (y,y):
    // kept N=6; Do-num per item: i2 has m=2, Σr²=2 → (4−2)/1 = 2;
    // Q = 2e9; margins x:3, y:3 → D = 3·3+3·3 = 18
    // alpha = 1 − (2e9·5)/(1e9·18) = 1 − 10/18 = 4/9
    val mixed = Seq((1, "x"), (1, "x"), (2, "x"), (2, "y"), (3, "y"),
      (3, "y")).toDF("i", "c")
    val m = Eval.krippendorffAlpha(mixed, "i", "c").collect().head
    assert(m.getAs[Double]("alpha") == 1.0 - 10.0 / 18.0)
    // single-rating items are excluded (no agreement evidence)
    val ragged = Seq((1, "x"), (1, "x"), (2, "x")).toDF("i", "c")
    val r = Eval.krippendorffAlpha(ragged, "i", "c").collect().head
    assert(r.getAs[Long]("n") == 2 && r.getAs[Long]("n_items") == 1)
    // the kept ratings are all one category → De = 0 → NULL, never NaN
    assert(r.isNullAt(r.fieldIndex("alpha")))
    val oneCat = Seq((1, "x"), (1, "x"), (2, "x"), (2, "x")).toDF("i", "c")
    val o = Eval.krippendorffAlpha(oneCat, "i", "c").collect().head
    assert(o.isNullAt(o.fieldIndex("alpha")))
  }

  test("classificationReport: hand-computed slices + rollup total; degenerate NULLs") {
    // slice a: tp=2 fp=1 fn=1 tn=1; slice b: all-negative predictions
    val df = Seq(
      ("a", true, true), ("a", true, true), ("a", false, true),
      ("a", true, false), ("a", false, false),
      ("b", false, false), ("b", false, false)).toDF("s", "y", "p")
    val rows = Eval.classificationReport(df, "y", "p", "s")
      .orderBy("slice").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("__all__", "a", "b"))
    val a = rows(1)
    assert((a.getAs[Long]("tp"), a.getAs[Long]("fp"), a.getAs[Long]("fn"),
      a.getAs[Long]("tn")) == ((2L, 1L, 1L, 1L)))
    assert(a.getAs[Double]("prec") == 2.0 / 3.0)
    assert(a.getAs[Double]("rec") == 2.0 / 3.0)
    assert(a.getAs[Double]("f1") == 4.0 / 6.0)
    assert(a.getAs[Double]("acc") == 3.0 / 5.0)
    // MCC by hand: (2*1-1*1)/sqrt(3*3*2*2) = 1/6
    assert(a.getAs[Double]("mcc") == 1.0 / 6.0)
    // slice b: no positives anywhere → prec (0 predicted pos), mcc NULL;
    // rec undefined (no actual pos) — NULL, never NaN
    val b = rows(2)
    assert(b.isNullAt(b.fieldIndex("prec")))
    assert(b.isNullAt(b.fieldIndex("rec")))
    assert(b.isNullAt(b.fieldIndex("mcc")))
    assert(b.getAs[Double]("acc") == 1.0)
    // rollup total pools the counts
    val t = rows(0)
    assert(t.getAs[Long]("n") == 7L && t.getAs[Long]("tp") == 2L &&
      t.getAs[Long]("tn") == 3L)
    // NULL slice reports as __null__, distinct from the total row
    val withNull = Seq((null.asInstanceOf[String], true, true))
      .toDF("s", "y", "p")
    val ns = Eval.classificationReport(withNull, "y", "p", "s")
      .collect().map(_.getString(0)).toSet
    assert(ns == Set("__all__", "__null__"))
  }
}
