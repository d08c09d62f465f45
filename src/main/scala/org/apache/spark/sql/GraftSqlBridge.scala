package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (the Spark 4
  * classic API). Living in the org.apache.spark.sql package is the
  * standard extension-library pattern for exposing custom Catalyst
  * expressions as Columns. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** True iff no DataFrame is cached in this session — lets tests assert
    * that operators never leak persisted blocks (sharedState is
    * private[sql]). */
  def noCachedPlans(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty

  /** Apply a SparkSessionExtensions' injected functions to an EXISTING
    * session's registry (`registerFunctions` is `private[sql]`) — lets
    * tests drive `graft.GraftExtensions` through Spark's own injection
    * machinery without building a second SparkContext. */
  def applyFunctionInjections(ext: SparkSessionExtensions,
                              spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)

  /** The session's scan split size (`spark.sql.files.maxPartitionBytes`)
    * — the bound [[graft.operators.Spread]] compares size estimates
    * against (the conf key object is `private[sql]`). */
  def maxPartitionBytes(spark: SparkSession): Long =
    spark.sessionState.conf.filesMaxPartitionBytes

  /** A scratch directory Spark deletes RECURSIVELY at JVM shutdown
    * (`Utils.createTempDir` registers it with the shutdown-delete hook;
    * a bare `deleteOnExit` only removes an empty directory, leaking the
    * parquet files written inside). */
  def managedTempDir(prefix: String): java.io.File =
    org.apache.spark.util.Utils.createTempDir(namePrefix = prefix)
}
