package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: pre-shuffle a table ONCE into hash buckets on
  * its join key so that every subsequent join/aggregation on that key
  * runs shuffle-free (Spark reads bucket files already partitioned by the
  * key; with sortBy the sort-merge join also skips its sort).
  *
  * At 100 TB this is the difference between re-shuffling a fact table per
  * query and paying the shuffle once at ingest: the standard lakehouse
  * layout decision for hot join keys. */
object Bucketing {

  /** Write a bucketed + sorted copy registered as `table` in the session
    * catalog (parquet files under the warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Append into an EXISTING bucketed table with the same layout — the
    * incremental-ingest write: new files land in the right hash buckets,
    * so every downstream bucket-pruned scan and zero-exchange join keeps
    * working over old + new data without a rewrite. The bucket count is
    * read from the catalog (a mismatched count would silently break the
    * co-partitioning contract, so it is not caller-suppliable). */
  def appendBucketed(df: DataFrame, table: String, key: String): Unit = {
    val spark = df.sparkSession
    val spec = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).bucketSpec
    require(spec.nonEmpty, s"$table is not a bucketed table")
    df.write.mode("append").format("parquet")
      .bucketBy(spec.get.numBuckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Rebuild-in-place prep: drop `table` from the catalog AND delete any
    * leftover managed warehouse directory — saveAsTable refuses a managed
    * location that exists without a matching catalog entry (the state a
    * crashed previous build leaves behind). */
  def dropForRewrite(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    loc.getFileSystem(spark.sessionState.newHadoopConf()).delete(loc, true)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Similarity-clustered parquet write: range-partition and sort the
    * corpus by its 64-bit SimHash before writing, so near-duplicate /
    * same-template documents land ADJACENT within row groups — columnar
    * compression (dictionary, zstd) then encodes the shared bytes once
    * instead of once per scattered copy; the standard "cluster by
    * similarity before you compress" layout trick for crawl corpora.
    * One range shuffle (sampled bounds — parallel by construction) +
    * in-partition sort; the signature is a per-row kernel projection and
    * is dropped before writing. Caller reads the result back as plain
    * parquet. */
  def writeClusteredBySimhash(docs: DataFrame, textCol: String,
                              path: String, partitions: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    val sh = docs.withColumn("__graft_sh",
      graft.operators.Dedup.simhash64(col(textCol)))
    val parted =
      if (partitions > 0) sh.repartitionByRange(partitions, col("__graft_sh"))
      else sh.repartitionByRange(col("__graft_sh"))
    parted.sortWithinPartitions("__graft_sh").drop("__graft_sh")
      .write.mode("overwrite").parquet(path)
  }

  /** Join two tables bucketed on the same key with the same bucket count —
    * plans as a zero-exchange sort-merge join. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
