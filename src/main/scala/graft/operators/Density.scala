package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Density clustering (DBSCAN roles) by the EPSILON-GRID join — the
  * distributed substitute for an index-based neighbor query: each point
  * hashes to its ⌊coord/eps⌋ grid cell, candidates are exactly the
  * points in the 3×3 neighborhood (every true eps-neighbor lands
  * there), and the all-pairs filter runs only WITHIN co-bucketed rows.
  * The classic analysis pass over an embedding plane: which regions are
  * dense (core), which points hang off a cluster (border), and which
  * are isolated (noise) — the data-pruning / outlier-mining signal.
  *
  * Scale shape: one bounded ×9 replication explode, one cell-keyed
  * shuffle join (never a cartesian product), one count aggregate per
  * phase. Pair volume is Σ_cell |cell|·|nbrhood| — eps bounds the
  * occupancy, and a pathological mega-cell degrades to that cell only,
  * not the corpus. Distances are exact double arithmetic with the
  * identical IEEE sequence on both engines (squared distance vs eps² —
  * no sqrt), so the role labels are bit-replayable.
  */
object Density {

  private def sqDist(ax: Column, ay: Column, bx: Column, by: Column): Column =
    (ax - bx) * (ax - bx) + (ay - by) * (ay - by)

  /** DBSCAN point roles over the 2D projection (`xCol`, `yCol`):
    * neighbor counts within `eps` (inclusive, self counted — the
    * textbook |N_eps(p)| ≥ minPts core rule), then
    * core / border (non-core with ≥ 1 core neighbor) / noise.
    *
    * Returns (idCol, n_neighbors, role). Two grid joins total (counts,
    * then core-neighbor lookup) — at 100 TB persist the pair relation
    * under a [[CacheScope]] to collapse them to one.
    */
  def dbscanRoles(points: DataFrame, idCol: String, xCol: String,
                  yCol: String, eps: Double, minPts: Long): DataFrame = {
    require(eps > 0, s"eps must be > 0, got $eps")
    val p = points.select(col(idCol).as("__id"),
      col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
    val cellX = floor(col("__x") / lit(eps)).cast("long")
    val cellY = floor(col("__y") / lit(eps)).cast("long")
    // left side rides once under its own cell; right side replicates to
    // the 3×3 neighborhood, so the join key equality covers every true
    // eps-ball overlap
    val lhs = p.select(col("__id").as("__ida"), col("__x").as("__xa"),
      col("__y").as("__ya"), cellX.as("__cx"), cellY.as("__cy"))
    val rhs = p
      .select(col("__id").as("__idb"), col("__x").as("__xb"),
        col("__y").as("__yb"), cellX.as("__bx"), cellY.as("__by"))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("__idb"), col("__xb"), col("__yb"),
        (col("__bx") + col("__dx")).as("__cx"),
        (col("__by") + col("__dy")).as("__cy"))
    val eps2 = eps * eps
    def pairs: DataFrame = lhs.join(rhs, Seq("__cx", "__cy"))
      .where(sqDist(col("__xa"), col("__ya"), col("__xb"), col("__yb"))
        <= lit(eps2))
      .select(col("__ida"), col("__idb"))
    val counts = pairs.groupBy("__ida")
      .agg(count(lit(1)).as("__cnt"))
    val roles = pairs
      .join(counts.select(col("__ida").as("__idb"),
        col("__cnt").as("__cntb")), "__idb")
      .groupBy("__ida")
      .agg(count(lit(1)).as("n_neighbors"),
        max((col("__cntb") >= minPts).cast("int")).as("__hasCore"))
      .select(col("__ida").as(idCol), col("n_neighbors"),
        when(col("n_neighbors") >= minPts, lit("core"))
          .when(col("__hasCore") === 1, lit("border"))
          .otherwise(lit("noise")).as("role"))
    roles
  }

  /** [[dbscanRoles]] as DuckDB SQL over a `p(id, x, y)` CTE the caller
    * supplies — the oracle skips the grid (plan-level device only) and
    * self-joins directly; the squared-distance filter and role CASE are
    * the identical IEEE/integer sequences. Full statement emitting
    * (idAlias, n_neighbors, role). */
  def dbscanOracleSql(pCte: String, idAlias: String, eps: Double,
                      minPts: Long): String = {
    val eps2 = eps * eps
    s"""WITH $pCte,
       |prs AS (SELECT a.id AS ida, b.id AS idb
       |  FROM p a JOIN p b
       |    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |      <= $eps2),
       |cnt AS (SELECT ida, CAST(count(*) AS BIGINT) AS n FROM prs
       |  GROUP BY ida)
       |SELECT p2.ida AS $idAlias, CAST(count(*) AS BIGINT) AS n_neighbors,
       |  CASE WHEN CAST(count(*) AS BIGINT) >= $minPts THEN 'core'
       |       WHEN max(CASE WHEN cb.n >= $minPts THEN 1 ELSE 0 END) = 1
       |         THEN 'border'
       |       ELSE 'noise' END AS role
       |FROM prs p2 JOIN cnt cb ON cb.ida = p2.idb
       |GROUP BY p2.ida""".stripMargin
  }
}
