package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ-shaped
  * capability): a rule list compiles into ONE pass over the relation,
  * returning a per-rule violation report — the gate a 100 TB pipeline
  * runs between "snapshot landed" and "snapshot admitted to training".
  *
  * Scale shape: every scalar rule (null / range / set / regex) becomes a
  * conditional-sum column inside a single global aggregate — one scan,
  * map-side combined, O(|rules|) bytes on the wire. Uniqueness rules
  * are the exception (they are aggregations BY the checked column, not
  * over rows) and cost one value-keyed groupBy each — still one shuffle
  * whose key cardinality is the column's, never a self-join.
  */
object Validate {

  /** One constraint over one column. `name` is stable output text. */
  sealed trait Rule { def name: String; def column: String }
  /** Value must not be NULL. */
  final case class NotNull(column: String) extends Rule {
    val name = "not_null"
  }
  /** Value must be in [lo, hi] (NULL counts as a violation). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = "in_range"
  }
  /** Value must be one of `values` (NULL counts as a violation). */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    val name = "in_set"
  }
  /** Value must fully match `regex` (NULL counts as a violation). */
  final case class MatchesRegex(column: String, regex: String) extends Rule {
    val name = "matches_regex"
  }
  /** Every value must occur exactly once; a violation row is any row
    * whose value occurs more than once (so `violations` counts the rows
    * inside duplicate groups, not the groups). */
  final case class Unique(column: String) extends Rule {
    val name = "unique"
  }

  private[graft] def violatedCond(df: DataFrame, r: Rule): Column = r match {
    case NotNull(c)       => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNull || col(c).cast("double") < lo || col(c).cast("double") > hi
    case InSet(c, vs)     => col(c).isNull || !col(c).isin(vs: _*)
    case MatchesRegex(c, re) =>
      col(c).isNull || !col(c).rlike("^(?:" + re + ")$")
    case _: Unique => throw new IllegalArgumentException(
      "unique rules are aggregations, not row predicates")
  }

  /** Run all rules; returns (rule, col_name, violations, n_rows) in the
    * caller's rule order (ORDER BY the first two columns for a
    * deterministic relation). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val scalar = rules.filter(!_.isInstanceOf[Unique])
    val uniques = rules.collect { case u: Unique => u }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (scalar.nonEmpty) {
      // coalesce: sum over ZERO rows is NULL, and an empty (truncated)
      // snapshot is exactly the case a gate must report as hard numbers
      // — `violations === 0` on a NULL would be neither true nor false
      val aggs = scalar.zipWithIndex.map { case (r, i) =>
        coalesce(sum(when(violatedCond(df, r), 1L).otherwise(0L)), lit(0L))
          .as(s"__v$i")
      } :+ count(lit(1)).as("__n")
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = scalar.zipWithIndex.map { case (r, i) =>
        s"'${r.name}', '${r.column}', __v$i"
      }.mkString(", ")
      parts += one.select(
        expr(s"stack(${scalar.size}, $stackArgs) AS (rule, col_name, violations)"),
        col("__n").as("n_rows"))
    }
    uniques.foreach { u =>
      val grouped = df.groupBy(col(u.column)).agg(count(lit(1)).as("__c"))
      parts += grouped.agg(
        coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)), lit(0L))
          .as("violations"),
        coalesce(sum("__c"), lit(0L)).as("n_rows"))
        .select(lit(u.name).as("rule"), lit(u.column).as("col_name"),
          col("violations"), col("n_rows"))
    }
    parts.reduce(_ unionAll _)
  }

  /** Cross-table referential-integrity audit: does every non-NULL
    * foreign key in `fact.fkCol` exist in `dim.pkCol`? Returns ONE row
    * — (n_rows, n_null_fk, n_orphan_rows, n_orphan_keys, holds) — the
    * FK complement of [[check]]'s single-table rules. NULL FKs are
    * counted but are NOT orphans (SQL FK semantics: NULL cannot
    * violate); `holds` means zero orphan rows.
    *
    * Shape: dim keys project+distinct to a key-only relation, then ONE
    * left join keyed on the FK (broadcast when the key set is small,
    * AQE's call) feeding a single aggregate — no anti-join rescan, no
    * collect. Orphan-key cardinality is an exact COUNT DISTINCT riding
    * the same aggregate. */
  def referentialIntegrity(fact: DataFrame, fkCol: String,
                           dim: DataFrame, pkCol: String): DataFrame = {
    val keys = dim.select(col(pkCol).as("__pk")).distinct()
      .withColumn("__hit", lit(1))
    fact.select(col(fkCol).as("__fk"))
      .join(keys, col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("__fk").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_null_fk"),
        coalesce(sum(when(col("__fk").isNotNull && col("__hit").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_orphan_rows"),
        countDistinct(when(col("__hit").isNull, col("__fk")))
          .as("n_orphan_keys"))
      .withColumn("holds", col("n_orphan_rows") === 0L)
  }

  /** [[referentialIntegrity]] as DuckDB SQL; caller supplies relation
    * names. */
  def referentialIntegrityOracleSql(fact: String, fkCol: String,
                                    dim: String, pkCol: String): String =
    s"""SELECT count(*) AS n_rows,
       |  CAST(COALESCE(sum(CASE WHEN f.$fkCol IS NULL THEN 1 ELSE 0 END),
       |    0) AS BIGINT) AS n_null_fk,
       |  CAST(COALESCE(sum(CASE WHEN f.$fkCol IS NOT NULL
       |    AND d.__pk IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
       |    AS n_orphan_rows,
       |  count(DISTINCT CASE WHEN d.__pk IS NULL THEN f.$fkCol END)
       |    AS n_orphan_keys,
       |  CAST(COALESCE(sum(CASE WHEN f.$fkCol IS NOT NULL
       |    AND d.__pk IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) = 0
       |    AS holds
       |FROM $fact f LEFT JOIN
       |  (SELECT DISTINCT $pkCol AS __pk FROM $dim) d
       |  ON f.$fkCol = d.__pk""".stripMargin

  /** Escape a string for a single-quoted SQL literal. */
  private def q(s: String): String = s.replace("'", "''")

  /** DuckDB oracle twin of [[check]] over a relation named `t`: one
    * UNION ALL branch per rule (the oracle may rescan; the Spark side
    * must not). Caller appends ORDER BY. */
  def oracleSql(rules: Seq[Rule]): String = rules.map {
    case NotNull(c) =>
      s"""SELECT 'not_null' AS rule, '$c' AS col_name,
         |  CAST(COALESCE(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations,
         |  CAST(count(*) AS BIGINT) AS n_rows FROM t""".stripMargin
    case InRange(c, lo, hi) =>
      s"""SELECT 'in_range', '$c',
         |  CAST(COALESCE(sum(CASE WHEN $c IS NULL OR CAST($c AS DOUBLE) < $lo
         |    OR CAST($c AS DOUBLE) > $hi THEN 1 ELSE 0 END), 0) AS BIGINT),
         |  CAST(count(*) AS BIGINT) FROM t""".stripMargin
    case InSet(c, vs) =>
      val list = vs.map(v => s"'${q(v)}'").mkString(", ")
      s"""SELECT 'in_set', '$c',
         |  CAST(COALESCE(sum(CASE WHEN $c IS NULL OR $c NOT IN ($list)
         |    THEN 1 ELSE 0 END), 0) AS BIGINT),
         |  CAST(count(*) AS BIGINT) FROM t""".stripMargin
    case MatchesRegex(c, re) =>
      s"""SELECT 'matches_regex', '$c',
         |  CAST(COALESCE(sum(CASE WHEN $c IS NULL
         |    OR NOT regexp_full_match($c, '(?:${q(re)})')
         |    THEN 1 ELSE 0 END), 0) AS BIGINT),
         |  CAST(count(*) AS BIGINT) FROM t""".stripMargin
    case Unique(c) =>
      s"""SELECT 'unique', '$c',
         |  CAST(COALESCE(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS BIGINT),
         |  CAST(COALESCE(sum(c), 0) AS BIGINT)
         |FROM (SELECT count(*) AS c FROM t GROUP BY $c)""".stripMargin
  }.mkString("\nUNION ALL\n")
}
