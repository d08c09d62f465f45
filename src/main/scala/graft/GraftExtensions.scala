package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-wide registration of every graft_* native SQL function:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes the whole SQL surface available in every session without any
  * per-session `X.register(spark)` call — the standard Spark packaging
  * for an extension library (the per-object `register` temp-function
  * path stays for notebook/adhoc use; both routes share the same
  * validated builders, so argument errors are identical). Function
  * injection only — the engine deliberately ships no custom rules or
  * strategies: every operator plans through stock Catalyst, which is
  * what keeps it compatible with AQE/DPP and future Spark upgrades. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
}

object GraftExtensions {
  /** (SQL name, usage string, builder) for every native function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", "_FUNC_(a, b) - cosine similarity of two float arrays",
      functions.CosineSimilarity.builder _),
    ("graft_dot", "_FUNC_(a, b) - dot product of two float arrays",
      functions.DotProduct.builder _),
    ("graft_normalize_ws", "_FUNC_(text) - trim, lowercase, squash whitespace runs",
      functions.NormalizeWs.builder _),
    ("graft_unicode_normalize", "_FUNC_(text[, form]) - Unicode NFC/NFD/NFKC/NFKD",
      functions.UnicodeNormalize.builder _),
    ("graft_shingles", "_FUNC_(text, n[, distinct]) - word n-gram shingles",
      functions.WordShingles.builder _),
    ("graft_top_k", "_FUNC_(score, id, k) - bounded partial top-k aggregate",
      functions.TopKByScore.builder _),
    ("graft_frequent_items", "_FUNC_(item, capacity, k) - Misra-Gries heavy hitters",
      functions.FrequentItems.builder _),
    ("graft_count_min", "_FUNC_(item, width, depth) - Count-Min frequency sketch",
      functions.CountMin.builder _),
    ("graft_cm_estimate", "_FUNC_(sketch, item, width, depth) - Count-Min point estimate",
      functions.CountMin.estimateBuilder _),
    ("graft_jaro", "_FUNC_(a, b) - Jaro string similarity",
      functions.JaroWinkler.jaroBuilder _),
    ("graft_jaro_winkler", "_FUNC_(a, b) - Jaro-Winkler string similarity",
      functions.JaroWinkler.jaroWinklerBuilder _),
    ("graft_luhn", "_FUNC_(digits) - Luhn mod-10 checksum validation",
      functions.LuhnCheck.builder _))
}
