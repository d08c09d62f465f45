package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Caller-owned cache lifetime for multi-consumer operator DAGs.
  *
  * Operators like [[Dedup.minhashLshPairs]] reference an expensive
  * intermediate (the signature relation) from several branches of the
  * returned plan. Persisting it inside the operator would leak the cached
  * blocks forever — the operator returns a LAZY DataFrame and can never
  * know when the caller's terminal action has run (the round-1 bench
  * measured exactly this leak: every query after the leaking one ran
  * 3–13× slower in a shared session). Instead, the default plans rely on
  * Spark's exchange reuse (identical canonical shuffle subtrees are
  * computed once per action), and callers that will run MULTIPLE actions
  * over one operator result opt into caching with an explicit scope they
  * close themselves:
  *
  * {{{
  * val scope = new CacheScope()
  * try {
  *   val pairs = Dedup.minhashLshPairs(docs, "id", "text", scope = Some(scope))
  *   pairs.write.parquet(out)          // action(s) run with signatures cached
  * } finally scope.close()             // blocks released deterministically
  * }}}
  */
final class CacheScope(level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
    extends AutoCloseable {
  private val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` into this scope; released on [[close]]. */
  def cache(df: DataFrame): DataFrame = synchronized {
    val c = df.persist(level)
    cached += c
    c
  }

  override def close(): Unit = synchronized {
    cached.foreach(_.unpersist(blocking = false))
    cached.clear()
  }
}

object CacheScope {
  /** Run `f` with a scope, releasing every cached block afterwards. Only
    * safe when `f` runs the terminal actions itself (the result of a lazy
    * plan built inside must not escape). */
  def withScope[T](f: CacheScope => T): T = {
    val s = new CacheScope()
    try f(s) finally s.close()
  }

  /** Persist into the scope if one is given, else return the plan as-is
    * (leak-free default: exchange reuse de-duplicates the heavy subtrees
    * within a single action). */
  private[operators] def maybe(scope: Option[CacheScope], df: DataFrame): DataFrame =
    scope.fold(df)(_.cache(df))
}
