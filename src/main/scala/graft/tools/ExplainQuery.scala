package graft.tools

/** Print the formatted physical plan of one SparkEntry query at
  * sf0.001 — the interactive companion to [[PlanDigest]] (which pins
  * structural counts): when a digest drifts or a new query lands, this
  * is the "show me the actual plan" loop.
  *
  * Run: `sbt "runMain graft.tools.ExplainQuery q_cusum [sfDir]"`.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQuery <query_name> [sfDir]")
    val sfDir = if (args.length > 1) args(1) else PlanDigest.DefaultSfDir
    val spark = graft.GraftSession.getOrCreate("local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    // non-adaptive, like PlanDigest: the deterministic pre-AQE artifact
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    args(0).split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      println(s"=== $name ===")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
