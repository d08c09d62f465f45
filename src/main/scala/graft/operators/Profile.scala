package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column null counts, exact distinct
  * counts, and min/max rendered to strings, in long format — the
  * data-quality sweep a pipeline runs before trusting a new drop.
  *
  * ONE aggregate over one scan computes every column's stats (the
  * per-column rows come from exploding a struct array over the single
  * aggregate row — not one scan per column). Exact distincts expand the
  * aggregate (one shuffle pass per distinct column internally via
  * Spark's EXPAND); swap mentally to approx_count_distinct when
  * profiling thousand-column tables at 100 TB — the seam is the same.
  *
  * Min/max cross-engine string caveat: double rendering differs between
  * engines (scientific-notation thresholds), so oracle-checked
  * profiles stick to integer/string columns; the operator itself
  * accepts any orderable column. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val a = df.agg(aggs.head, aggs.tail: _*)
    a.select(explode(array(cols.map(c => struct(
      lit(c).as("col_name"), col("__rows").as("n_rows"),
      col(s"__n_$c").as("n_nulls"), col(s"__d_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))): _*))
      .as("p"))
      .select("p.*")
  }

  /** [[profile]] as DuckDB SQL over `relation` for the given columns
    * (integer/string columns only — see the rendering caveat above). */
  def profileOracleSql(relation: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value FROM $relation""".stripMargin
    }.mkString("", "\nUNION ALL\n", "")
}
