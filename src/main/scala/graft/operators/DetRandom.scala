package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic pseudo-randomness primitives, engine-exact.
  *
  * The repo's sampling ops already lean on md5 STRING ORDER for
  * reproducible choice; this object turns md5 into reproducible
  * NUMBERS: a 48-bit uniform long (hex digits folded via ascii
  * arithmetic — every piece a codegen'd builtin that DuckDB evaluates
  * identically), a scalable deterministic dense index, and contrastive
  * negative sampling built from the two.
  *
  * Unlike rand(seed) — whose draw depends on partition layout — every
  * value here is a pure function of row content, so results are
  * bit-identical across runs, partitionings and engines. */
object DetRandom {

  /** Uniform 48-bit non-negative long from md5(key): fold the first 12
    * hex digits with ascii arithmetic (acc·16 + digit). Narrow, no UDF. */
  def md5Long48(key: Column): Column = {
    val h = md5(key.cast("string"))
    (0 until 12).foldLeft(lit(0L)) { (acc, i) =>
      val c = ascii(substring(h, i + 1, 1))
      acc * 16L + when(c >= 97, c - 87).otherwise(c - 48).cast("long")
    }
  }

  /** DuckDB twin of [[md5Long48]] — same fold, same ascii arithmetic. */
  def md5Long48SqlExpr(keySql: String): String =
    (0 until 12).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      val c = s"ascii(substring(md5(CAST(($keySql) AS VARCHAR)), ${i + 1}, 1))"
      s"(($acc) * 16 + (CASE WHEN $c >= 97 THEN $c - 87 ELSE $c - 48 END))"
    }

  /** Uniform draw in [0, n) keyed by row content. */
  def uniformMod(key: Column, n: Column): Column = pmod(md5Long48(key), n)

  /** Deterministic DENSE 0-based index over `df` without a global sort:
    * rows hash into `buckets` md5-buckets, get a within-bucket
    * row_number (one bucket-keyed shuffle), and add the bucket's prefix
    * offset (a `buckets`-row window — tiny). The index depends only on
    * row ids, never partition layout: the scalable, reproducible
    * replacement for a 1-partition row_number (use Align's zipWithIndex
    * rowid instead when cross-run determinism doesn't matter — it skips
    * the per-bucket sort). Output: df columns + `idx`. */
  def denseIndex(df: DataFrame, idCol: String, buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val id = col(idCol)
    val b = pmod(md5Long48(id), lit(buckets.toLong)).as("__b")
    val withB = df.withColumn("__b", b)
    val rn = row_number().over(Window.partitionBy(col("__b"))
      .orderBy(md5(id.cast("string")), id))
    val counts = withB.groupBy("__b").agg(count(lit(1)).as("__c"))
    val offs = counts.withColumn("__off",
        coalesce(sum(col("__c")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    withB.withColumn("__rn", rn.cast("long"))
      .join(broadcast(offs), "__b")
      .withColumn("idx", col("__off") + col("__rn") - 1L)
      .drop("__b", "__rn", "__off")
  }

  /** Contrastive negative sampling: for every anchor row, `k`
    * deterministic uniform draws from the corpus (by dense index), with
    * the anchor itself and optional known positives excluded. Plan: one
    * [[denseIndex]] pass over the corpus, a k-way explode of anchors
    * (narrow), one equi-join on the drawn index, and an optional
    * broadcast anti-join on positives — no crossJoin anywhere. Draws
    * that hit the anchor or a positive are dropped, not redrawn (a doc
    * colliding with its own draw is ~k/N — callers needing exactly k
    * over-draw and window-trim). Output: (anchor, j, negIdCol). */
  def negativeSample(corpus: DataFrame, idCol: String,
                     anchors: DataFrame, anchorIdCol: String, k: Int,
                     positives: Option[(DataFrame, String, String)] = None,
                     buckets: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val indexed = denseIndex(corpus.select(col(idCol)), idCol, buckets)
      .select(col(idCol).as("__neg"), col("idx"))
    val n = indexed.agg(count(lit(1)).as("__n"))
    val drawn = anchors.select(col(anchorIdCol).as("anchor"))
      .crossJoin(broadcast(n))
      .select(col("anchor"), explode(sequence(lit(1), lit(k))).as("j"),
        col("__n"))
      .withColumn("idx", uniformMod(
        concat(col("anchor").cast("string"), lit(":"), col("j").cast("string")),
        col("__n")))
      .drop("__n")
    val joined = drawn.join(indexed, "idx")
      .where(col("__neg") =!= col("anchor"))
      .select(col("anchor"), col("j"), col("__neg").as("neg"))
    positives.fold(joined) { case (pos, aCol, pCol) =>
      joined.join(broadcast(pos.select(col(aCol).as("anchor"), col(pCol).as("neg"))),
        Seq("anchor", "neg"), "left_anti")
        .select("anchor", "j", "neg") // USING-join reorders; pin the contract
    }
  }

  /** DuckDB twin of [[denseIndex]] as a CTE body: emits
    * `SELECT <id>, idx FROM ...` over `from`. */
  def denseIndexSql(idSql: String, from: String, buckets: Int = 256): String = {
    val h = md5Long48SqlExpr(idSql)
    s"""SELECT $idSql, __off + __rn - 1 AS idx FROM (
       |  SELECT $idSql, __b,
       |    row_number() OVER (PARTITION BY __b
       |      ORDER BY md5(CAST(($idSql) AS VARCHAR)), $idSql) AS __rn
       |  FROM (SELECT $idSql, ($h) % $buckets AS __b FROM $from) hb) wb
       |JOIN (SELECT __b,
       |    COALESCE(sum(__c) OVER (ORDER BY __b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS __off
       |  FROM (SELECT ($h) % $buckets AS __b, count(*) AS __c
       |        FROM $from GROUP BY 1) cc) oo USING (__b)""".stripMargin
  }
}
