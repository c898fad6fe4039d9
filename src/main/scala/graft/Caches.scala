package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.ConcurrentHashMap

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
  * module created and nothing else. Registration is deduplicated by the
  * analyzed plan's semantic hash, so re-running the same query persists
  * (and later unpersists) each distinct plan once instead of warning
  * "already cached" per rerun. Entries whose session has stopped are
  * swept on every call, so a dead session's registrations (and the
  * session object itself) never pin memory.
  */
object Caches {
  private val held =
    new ConcurrentHashMap[SparkSession, ConcurrentHashMap[Int, DataFrame]]()

  /** Evict entries of `map` whose session (per `sessionOf`) has
    * stopped — shared by this registry, [[Tables]]' preload cache and
    * the IVF quantizer memo, so the sweep semantics can't drift apart
    * across the three session-keyed maps. */
  private[graft] def sweepStopped[K](map: ConcurrentHashMap[K, _])(
      sessionOf: K => SparkSession): Unit = {
    val it = map.keySet().iterator()
    while (it.hasNext) if (sessionOf(it.next()).sparkContext.isStopped) it.remove()
  }

  /** persist() + register for later [[release]]. Returns `df`. A frame
    * whose analyzed plan is semantically identical to one already
    * registered for this session is NOT persisted again — the cache
    * manager would resolve it to the existing InMemoryRelation anyway. */
  def persist(df: DataFrame): DataFrame = {
    sweepStopped(held)(identity)
    val perSession =
      held.computeIfAbsent(df.sparkSession, _ => new ConcurrentHashMap[Int, DataFrame]())
    perSession.computeIfAbsent(
      df.queryExecution.analyzed.semanticHash(),
      _ => { df.persist(); df })
    df
  }

  private val heldRdds =
    new ConcurrentHashMap[SparkSession, java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]]()

  /** Register a directly-persisted RDD (e.g. a `localCheckpoint`'s
    * backing RDD) for release. DataFrame.unpersist only reaches the
    * cache manager, so checkpoint blocks need their own ledger. */
  def registerRdd(spark: SparkSession, rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    sweepStopped(heldRdds)(identity)
    heldRdds
      .computeIfAbsent(spark, _ => new java.util.concurrent.ConcurrentLinkedQueue())
      .add(rdd)
  }

  private val frames =
    new ConcurrentHashMap[SparkSession, ConcurrentHashMap[Any, DataFrame]]()

  /** Memoize an EAGERLY-BUILT frame by an input-derived key. The
    * semantic-hash dedup in [[persist]] keys on the OUTPUT plan, which
    * is useless for operators that materialize during construction
    * (localCheckpoint lineages contain fresh LogicalRDDs, so every
    * build hashes differently): without this, each invocation of the
    * staged pair sweep would re-run all its waves and strand another
    * persisted frame. Key on what went IN (source plan hash + the
    * knobs); lifetime is the same release() cycle as every other
    * registration here. Build runs OUTSIDE the map lock (it launches
    * Spark jobs); a racing duplicate build is wasted work, not a leak
    * — the loser's persist is released with the session's ledger. */
  def memoFrame(spark: SparkSession, key: Any)(build: => DataFrame): DataFrame = {
    sweepStopped(frames)(identity)
    val perSession =
      frames.computeIfAbsent(spark, _ => new ConcurrentHashMap[Any, DataFrame]())
    val cached = perSession.get(key)
    if (cached != null) cached
    else {
      val built = build
      val prior = perSession.putIfAbsent(key, built)
      if (prior != null) prior else built
    }
  }

  /** Drop ONLY the [[memoFrame]] entries for `spark` (bench hook). The
    * persisted inputs and the checkpoint-RDD ledger stay registered, so
    * the next identical build re-pays exactly the memoized pass (e.g.
    * connected components) against the still-standing inputs — the
    * shared-floor contract graft.Bench charges its pair family under.
    * Superseded checkpoint blocks are released with the family's normal
    * [[release]]. */
  def clearMemoFrames(spark: SparkSession): Unit = { frames.remove(spark); () }

  private val decisions =
    new ConcurrentHashMap[SparkSession, ConcurrentHashMap[(Int, Long), java.lang.Boolean]]()

  /** Memoize a measured boolean decision (e.g. "does this frame fit
    * the broadcast budget") per (analyzed-plan semantic hash, budget),
    * scoped to the SAME lifetime as this registry's persists: a plan
    * measured once is not re-counted on every rebuild of the same
    * query (graft.Bench's repeat runs were paying one count() job per
    * plan construction), but [[release]] clears the memo together with
    * the cached frames — so a long-lived session that releases between
    * pipelines re-measures against the data as it is THEN, keeping the
    * measured-broadcast doctrine honest for growing corpora. */
  def decideOnce(spark: SparkSession, planKey: Int, budget: Long)(
      measure: => Boolean): Boolean = {
    sweepStopped(decisions)(identity)
    val perSession = decisions
      .computeIfAbsent(spark, _ => new ConcurrentHashMap[(Int, Long), java.lang.Boolean]())
    val key = (planKey, budget)
    // Measure OUTSIDE the map's bin lock: the closure runs a Spark
    // count() job that can take seconds (and could re-enter decideOnce,
    // which computeIfAbsent forbids). A rare duplicate measurement under
    // a race is harmless — putIfAbsent keeps the first answer.
    val cached = perSession.get(key)
    if (cached != null) cached.booleanValue()
    else {
      val measured: java.lang.Boolean = measure
      val prior = perSession.putIfAbsent(key, measured)
      (if (prior != null) prior else measured).booleanValue()
    }
  }

  /** Unpersist every frame and RDD registered for `spark`
    * (blocking=false: the executors drop blocks asynchronously;
    * subsequent queries just recompute — except checkpoint RDDs, whose
    * consumers must re-run the producing operator). Safe to call when
    * nothing is registered. */
  def release(spark: SparkSession): Unit = {
    val perSession = held.remove(spark)
    if (perSession != null) perSession.values().forEach(_.unpersist())
    val rdds = heldRdds.remove(spark)
    if (rdds != null) rdds.forEach(_.unpersist(blocking = false))
    decisions.remove(spark)
    frames.remove(spark)
    sweepStopped(held)(identity)
  }

  /** Number of live registrations for `spark` (spec hook). */
  def registered(spark: SparkSession): Int = {
    val perSession = held.get(spark)
    val n = if (perSession == null) 0 else perSession.size()
    val rdds = heldRdds.get(spark)
    n + (if (rdds == null) 0 else rdds.size())
  }
}
