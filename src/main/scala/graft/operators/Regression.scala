package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form per-group ordinary least squares — the "trend per key"
  * analytic (quality drift per source over time, value trend per user):
  * slope, intercept and r² of y ~ x within each group, from ONE hash
  * aggregate over five moment sums. No window, no per-group iteration —
  * the shuffle carries one row of sums per (task, group).
  *
  * Numerics: inputs are quantized to integers (floor(v·quant)) and every
  * moment — and the n·Σxy−ΣxΣy / n·Σx²−(Σx)² combination itself — is
  * EXACT integer arithmetic in DECIMAL(38,0) (HUGEINT on the DuckDB
  * side), so there is no catastrophic cancellation and no
  * double→decimal rounding divergence between engines; only the final
  * divisions run in double, on identical exact integers. Slope and r²
  * are invariant to the common quantization scale; the intercept is
  * de-scaled by 1/quant. Keep quant·|x|, quant·|y| within ~1e18 per row
  * (the products accumulate in 38 digits). Degenerate groups (constant
  * x; constant y for r²) yield NULL, not ±Inf. */
object Regression {

  def groupLinearFit(df: DataFrame, keys: Seq[String],
                     xCol: Column, yCol: Column,
                     quant: Double = 1e6): DataFrame = {
    require(quant > 0, s"quant must be > 0, got $quant")
    val dec = DecimalType(38, 0)
    val xq = floor(xCol.cast("double") * quant).cast("long").cast(dec)
    val yq = floor(yCol.cast("double") * quant).cast("long").cast(dec)
    val sums = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(xq).as("sx"), sum(yq).as("sy"),
        sum(xq * yq).as("sxy"), sum(xq * xq).as("sxx"), sum(yq * yq).as("syy"))
    val nD = col("n").cast(dec)
    val covN = (nD * col("sxy") - col("sx") * col("sy")).cast("double")
    val varXN = (nD * col("sxx") - col("sx") * col("sx")).cast("double")
    val varYN = (nD * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = covN / varXN
    sums.select(keys.map(col) ++ Seq(
      col("n"),
      when(varXN === 0.0, lit(null)).otherwise(slope).as("slope"),
      when(varXN === 0.0, lit(null))
        .otherwise((col("sy").cast("double") - slope * col("sx").cast("double"))
          / col("n").cast("double") / lit(quant)).as("intercept"),
      when(varXN === 0.0 || varYN === 0.0, lit(null))
        .otherwise((covN * covN) / (varXN * varYN)).as("r2")): _*)
  }

  /** DuckDB oracle twin: same quantization, same exact HUGEINT moments
    * and combination, same double divisions. `keysSql` comma list,
    * `xSql`/`ySql` scalar expressions over `from`. */
  def groupLinearFitOracleSql(keysSql: String, xSql: String, ySql: String,
                              from: String, quant: Double = 1e6): String = {
    val xq = s"CAST(floor(($xSql) * $quant) AS HUGEINT)"
    val yq = s"CAST(floor(($ySql) * $quant) AS HUGEINT)"
    val covN = "(CAST(n AS HUGEINT) * sxy - sx * sy)"
    val varXN = "(CAST(n AS HUGEINT) * sxx - sx * sx)"
    val varYN = "(CAST(n AS HUGEINT) * syy - sy * sy)"
    val (covD, varXD, varYD) =
      (s"CAST($covN AS DOUBLE)", s"CAST($varXN AS DOUBLE)", s"CAST($varYN AS DOUBLE)")
    val slope = s"($covD / $varXD)"
    s"""WITH s AS (SELECT $keysSql, count(*) AS n,
       |    sum($xq) AS sx, sum($yq) AS sy, sum($xq * $yq) AS sxy,
       |    sum($xq * $xq) AS sxx, sum($yq * $yq) AS syy
       |  FROM $from GROUP BY $keysSql)
       |SELECT $keysSql, n,
       |  CASE WHEN $varXD = 0 THEN NULL ELSE $slope END AS slope,
       |  CASE WHEN $varXD = 0 THEN NULL
       |    ELSE (CAST(sy AS DOUBLE) - $slope * CAST(sx AS DOUBLE))
       |      / CAST(n AS DOUBLE) / $quant END AS intercept,
       |  CASE WHEN $varXD = 0 OR $varYD = 0 THEN NULL
       |    ELSE ($covD * $covD) / ($varXD * $varYD) END AS r2
       |FROM s""".stripMargin
  }
}
