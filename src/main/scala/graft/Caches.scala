package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/** Session-scoped registry of operator-internal persisted frames.
  *
  * Several operators persist() a small intermediate (sign sketches,
  * simhash signatures, candidate pair lists) because the frame is read
  * from both sides of a self-join and an Exchange alone is not a
  * reliable materialization boundary. A lazy DataFrame can't unpersist
  * itself after "its" action — the operator returns before anything
  * runs — so without a registry those blocks accumulate for the life
  * of the session (the old workaround was a blanket
  * `cacheManager.clearCache()`, which also evicts caches the caller
  * owns, e.g. the bench's preloaded tables).
  *
  * Operators route persists through [[persist]]; a long-lived session
  * calls [[release]] between pipelines to drop exactly the blocks this
  * module created and nothing else. Entries whose session has stopped
  * are swept on every call, so a dead session's registrations (and the
  * session object itself) never pin memory.
  */
object Caches {
  private val held =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[DataFrame]]()

  /** persist() + register for later [[release]]. Returns `df`. */
  def persist(df: DataFrame): DataFrame = {
    sweep()
    df.persist()
    held.computeIfAbsent(df.sparkSession, _ => new ConcurrentLinkedQueue[DataFrame]())
      .add(df)
    df
  }

  /** Unpersist every frame registered for `spark` (blocking=false: the
    * executors drop blocks asynchronously; subsequent queries just
    * recompute). Safe to call when nothing is registered. */
  def release(spark: SparkSession): Unit = {
    val q = held.remove(spark)
    if (q != null) q.forEach(_.unpersist())
    sweep()
  }

  /** Number of live registrations for `spark` (spec hook). */
  def registered(spark: SparkSession): Int = {
    val q = held.get(spark)
    if (q == null) 0 else q.size()
  }

  /** Drop registrations whose session is stopped — their cached blocks
    * died with the executors; the map must not keep the session
    * reachable. */
  private def sweep(): Unit = {
    val it = held.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
  }
}
