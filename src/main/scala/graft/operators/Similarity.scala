package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * The scalar kernels (dot / norm / cosine) are higher-order array
  * expressions — codegen'd, no UDFs. Two search paths:
  *
  *  - [[bruteForceTopK]]: exact. Queries are broadcast (they are top-k
  *    *queries*, small by construction); the corpus streams map-side, a
  *    per-query top-k window finishes. Corpus-side cost O(n·q·d) flops but
  *    zero corpus shuffle beyond the final per-query k rows.
  *  - [[annTopK]]: approximate. Random-hyperplane LSH buckets both sides;
  *    only same-bucket candidates are scored. The bucket join is an
  *    equi-join → hash-partitioned, scales with executors. Recall is
  *    tunable by `planes` (fewer planes → bigger buckets → higher recall).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Composition-of-built-ins cosine (interpreted lambdas) — kept for
    * differential testing against the native expression. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** Cosine similarity — native codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]]); bit-identical to
    * [[cosineHof]], one fused pass. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Per-group element-wise centroid of an embedding column, computed as
    * posexplode → groupBy (group, position) → mean over 1e-9-quantized
    * values (floor(v·1e9) accumulated as exact longs). The quantization
    * makes the result bit-reproducible regardless of aggregation order or
    * engine (float→decimal casts round differently across engines) at a
    * precision far below float input noise. Output: (groupCols..., pos
    * 1-based, mean). Shuffle carries one row per (group, dim). */
  def centroids(df: DataFrame, groupCols: Seq[String], vecCol: String): DataFrame = {
    val ex = df.select(groupCols.map(col) :+ posexplode(col(vecCol)).as(Seq("__pos", "__v")): _*)
    val scaled = floor(col("__v").cast("double") * 1e9).cast("long")
    ex.groupBy(groupCols.map(col) :+ (col("__pos") + 1).as("pos"): _*)
      .agg((org.apache.spark.sql.functions.sum(scaled).cast("double") /
        (count(lit(1)) * lit(1e9))).as("mean"))
  }

  /** Deterministic random hyperplanes (dim doubles each) from a seed. */
  private[operators] def planesFor(planes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id: integer whose bit j = sign(dot(v, r_j)). */
  def lshBucket(v: Column, planes: Int, dim: Int, seed: Long): Column =
    planesFor(planes, dim, seed).zipWithIndex.map { case (p, j) =>
      when(dot(v, typedlit(p)) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** [[lshBucket]] rendered as DuckDB SQL: the hyperplanes are
    * deterministic from (planes, dim, seed), so they inline as double
    * literals and an external engine reproduces the exact bucket ids —
    * double dot products are bit-identical (same literals, same
    * sequential accumulation), so the sign tests agree. */
  def lshBucketOracleSqlExpr(vecRef: String, planes: Int, dim: Int, seed: Long): String =
    planesFor(planes, dim, seed).zipWithIndex.map { case (p, j) =>
      val lits = p.map(_.toString).mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip($vecRef, $lits), " +
        s"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) >= 0.0 " +
        s"THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Per-query top-k finisher over a scored (__qid, __cid, __sim)
    * relation, via the bounded-heap partial aggregate
    * [[graft.functions.TopKByScore]]. Map-side partial aggregation
    * truncates each partition's state to k pairs BEFORE the shuffle, so
    * the exchange carries ≤ k·partitions rows per query — the previous
    * `row_number() OVER (PARTITION BY __qid)` form shuffled the entire
    * n·q scored relation into q reducer partitions, a handful of hot
    * reducers at corpus scale. Same output, same (sim desc, id asc)
    * deterministic order. */
  private def finishTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("__qid")
      .agg(graft.functions.TopKByScore(col("__sim"), col("__cid").cast("long"), k).as("__top"))
      .select(col("__qid"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("__qid").as("query_id"), (col("__pos") + 1).as("rank"),
        col("__e.id").as("neighbor_id"), col("__e.score").as("cosine"))

  /** Exact cosine top-k: for each row of `queries`, the k nearest corpus
    * rows. Output: (queryId, rank, neighborId, cosine). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv"))
    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(if (excludeSelf) col("__cid") =!= col("__qid") else lit(true))
      .select(col("__qid"), col("__cid"), cosine(col("__cv"), col("__qv")).as("__sim"))
    finishTopK(scored, k)
  }

  /** Approximate top-k via single-probe LSH bucketing. Rows whose bucket
    * contains fewer than k neighbors return fewer than k results — the
    * recall/cost dial is `planes`. */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, planes: Int = 4, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), planes, dim, seed).as("__bucket"))
    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"),
      lshBucket(col(qvecCol), planes, dim, seed).as("__bucket"))
    val scored = c.join(q, Seq("__bucket"))
      .where(col("__cid") =!= col("__qid"))
      .select(col("__qid"), col("__cid"), cosine(col("__cv"), col("__qv")).as("__sim"))
    finishTopK(scored, k)
  }
}
