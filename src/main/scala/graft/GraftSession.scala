package graft

import org.apache.spark.sql.SparkSession

/** Session factory — the analog of the reference's `init_db`/`close_db`
  * engine singleton (db.py:6-27), except the "dialect augmentation" layer
  * is just Spark conf: non-ANSI semantics (the reference's SQL behavior),
  * AQE with skew handling, UTC, and shuffle/scan sizing appropriate for
  * the deployment. The defaults below suit local[N]; on a cluster, set
  * `shufflePartitions` to ~2-3× total executor cores and leave
  * `maxPartitionBytes` at 128m so scan tasks stay memory-bounded. */
object GraftSession {
  def builder(master: String = "local[*]",
              shufflePartitions: Int = 32,
              appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")

  def getOrCreate(master: String = "local[*]",
                  shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    graft.functions.CosineSimilarity.register(s)
    graft.functions.DotProduct.register(s)
    graft.functions.TopKByScore.register(s)
    graft.functions.WordShingles.register(s)
    graft.functions.NormalizeWs.register(s)
    s
  }

  def stop(spark: SparkSession): Unit = spark.stop() // close_db (db.py:21-24)
}
