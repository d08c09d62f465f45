package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coreset selection by GREEDY K-CENTER (farthest-point traversal) —
  * the classic 2-approximation to the k-center cover and the standard
  * diversity-sampling pass over an embedding corpus: pick the point
  * farthest from everything selected so far, k times. The selected set
  * is the maximally-spread subsample for pruning / active labeling /
  * centroid seeding (k-means++'s deterministic cousin).
  *
  * Determinism contract: squared distances quantize PER COORDINATE to
  * integer nano-units (floor((aᵢ−bᵢ)²·1e9) as long) and sum exactly, so
  * the per-point min-distance and the global argmax are integer
  * comparisons — association-order-invariant, bit-replayable by the
  * oracle, immune to fold-order ulp flips. Ties break to the smallest
  * id; the seed is the smallest id.
  *
  * Scale shape: k rounds, each ONE broadcast join (the ≤ k selected
  * centers ride as data — the generated code is identical across
  * rounds, so whole-stage codegen compiles once) + one per-point min
  * aggregate + a top-1 TakeOrdered — never a shuffle of the corpus
  * against itself, nothing corpus-sized at the driver.
  */
object Coreset {

  /** Exact integer nano-quantized squared distance Σ⌊(aᵢ−bᵢ)²·1e9⌋. */
  private def sqDistQ(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor((x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double")) * lit(1e9)).cast("long")),
      lit(0L), (acc, t) => acc + t)

  /** Greedy k-center over `vecCol` (array of float/double): returns the
    * k selected rows as (round, idCol, d2_q9) — `round` 0 is the
    * smallest-id seed (d2_q9 = 0), round r > 0 is the point maximizing
    * the quantized squared distance to its nearest already-selected
    * center (tie → smallest id), with that distance. */
  def kCenter(points: DataFrame, idCol: String, vecCol: String,
              k: Int): DataFrame = {
    require(k >= 1 && k <= 256, s"k must be in [1,256], got $k")
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points.select(col(idCol).cast("long").as("__id"),
      col(vecCol).as("__v"))

    val seed = pts.orderBy("__id").limit(1).collect().headOption
    if (seed.isEmpty)
      return Seq.empty[(Int, Long, Long)].toDF("round", idCol, "d2_q9")
    val seedRow = seed.get
    var selected = Vector((0, seedRow.getLong(0),
      0L, seedRow.getSeq[Any](1)))

    for (r <- 1 until k) {
      // centers ride in as broadcast DATA — codegen-stable across rounds
      val cents = broadcast(
        selected.map { case (_, id, _, v) => (id, v.map {
          case f: Float => f.toDouble
          case d: Double => d
        }) }.toDF("__cid", "__cv"))
      val next = pts.crossJoin(cents)
        .select(col("__id"), col("__v"),
          sqDistQ(col("__v"), col("__cv")).as("__d2"))
        .groupBy("__id")
        .agg(min(col("__d2")).as("__dm"), first(col("__v")).as("__v"))
        .orderBy(col("__dm").desc, col("__id").asc)
        .limit(1)
        .collect()(0)
      selected :+= ((r, next.getLong(0), next.getLong(1),
        next.getSeq[Any](2)))
    }
    selected.map { case (r, id, d, _) => (r, id, d) }
      .toDF("round", idCol, "d2_q9")
  }

  /** [[kCenter]] as unrolled DuckDB CTEs over a caller-supplied
    * `p(id, v)` CTE (v a DOUBLE[]): the same per-coordinate floor-1e9
    * quantization, exact BIGINT sums, (distance DESC, id ASC) argmax.
    * Full statement emitting (round, idAlias, d2_q9). */
  def kCenterOracleSql(pCte: String, idAlias: String, k: Int): String = {
    def d2q(av: String, bv: String): String =
      s"""CAST(list_sum(list_transform(list_zip($av, $bv),
         |      x -> CAST(floor((x[1] - x[2]) * (x[1] - x[2]) * 1e9)
         |        AS BIGINT))) AS BIGINT)""".stripMargin
    // MATERIALIZED throughout: sel_{r-1} is referenced twice per round,
    // and DuckDB's default CTE inlining would re-evaluate the whole
    // prefix chain exponentially
    val head =
      s"""WITH $pCte,
         |sel0 AS MATERIALIZED (SELECT 0 AS round, id,
         |  CAST(0 AS BIGINT) AS dm FROM p
         |  ORDER BY id LIMIT 1)""".stripMargin
    val rounds = (1 until k).map { r =>
      s"""dmin$r AS MATERIALIZED (SELECT a.id,
         |    min(${d2q("a.v", "c.v")}) AS dm
         |  FROM p a JOIN p c
         |    ON c.id IN (SELECT id FROM sel${r - 1})
         |  GROUP BY a.id),
         |sel$r AS MATERIALIZED (SELECT * FROM sel${r - 1}
         |  UNION ALL
         |  (SELECT $r AS round, id, dm FROM dmin$r
         |   ORDER BY dm DESC, id ASC LIMIT 1))""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT round, id AS $idAlias, dm AS d2_q9 FROM sel${k - 1}"
  }
}
