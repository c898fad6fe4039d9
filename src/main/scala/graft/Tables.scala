package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import scala.util.control.NonFatal

/** Catalog over the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's directory-as-catalog model
  * (`duckdb_manager.cpp:180-210`: one table per file, name = stem)
  * for parquet; the typed-CSV variant lives in [[graft.sources.TypedCsv]].
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that stay broadcast-able at any scale factor
    * (region=5, nation=25 rows in TPC-H regardless of SF). */
  val broadcastable: Set[String] = Set("region", "nation")

  /** Per-(session,dir,name) cache of preloaded (possibly `.cache()`d)
    * tables — populated by [[preload]] so the bench can measure compute
    * without re-reading parquet per query. Keyed by session identity so
    * a preload in one session can never hand a stale DataFrame to
    * another; query code always goes through [[load]], so correctness
    * runs (no preload) read straight from disk. Entries whose session
    * has stopped are swept on every preload/clear (a stopped session's
    * cached blocks are gone anyway; holding the key would pin the
    * session and its plans against GC for the JVM's life). */
  private val cached =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def sweepStopped(): Unit = Caches.sweepStopped(cached)(_._1)

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val hit = cached.get((spark, dir, name))
    if (hit != null) hit
    else if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 refuses outright (`PARQUET_TYPE_ILLEGAL`). Read the column
    * as its raw int64 nanos (legacy `nanosAsLong`) and truncate to
    * microseconds with integer division — `ts div 1000`, not a double
    * divide, because epoch-ns (~1.7e18) exceeds the 2^53 double mantissa
    * and would corrupt low-order digits. DuckDB applies the same ns→µs
    * truncation when it casts its ns timestamp down, so the oracle agrees.
    *
    * The `nanosAsLong` conf is session-construction state
    * ([[GraftSession.builder]]), NOT set here: a read-time
    * `spark.conf.set` from a library call is a data race against every
    * concurrent query in the session (and against another thread's
    * read of the same flag). A session built without [[GraftSession]]
    * fails fast with `PARQUET_TYPE_ILLEGAL`, which names the fix. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Register just the tables a query needs (keeps catalog init from
    * failing on unrelated unreadable files). */
  def register(spark: SparkSession, dir: String, names: Seq[String]): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register every table as a temp view named after the file stem.
    * Tolerant: an unreadable optional table is skipped, not fatal — a
    * catalog over a 100-TB lake must not die because one side table has
    * an incompatible footer. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      try register(spark, dir, Seq(n))
      catch { case NonFatal(e) =>
        System.err.println(s"[tables] skipping unreadable table $n: ${e.getMessage}")
      }
    }

  /** Read + materialize tables into the Spark cache (bench use:
    * separates one-time load cost from per-query compute cost).
    * `except` names stay uncached: scans over a row-based
    * InMemoryRelation lose the vectorized parquet reader, which is a
    * measured loss for the array-heavy documents/embeddings pipelines
    * ("cache aggregates, not sort inputs" — BIGBENCH.md). */
  def preload(spark: SparkSession, dir: String,
              except: Set[String] = Set.empty): Unit = {
    sweepStopped()
    all.filterNot(except).foreach { n =>
      try {
        val df = load(spark, dir, n).cache()
        df.count() // force materialization
        cached.put((spark, dir, n), df)
      } catch { case NonFatal(e) =>
        System.err.println(s"[tables] preload skipped $n: ${e.getMessage}")
      }
    }
  }

  /** Drop this session's preloaded entries (returns [[load]] to its
    * side-effect-free read-from-disk behavior). */
  def clearPreload(spark: SparkSession): Unit = {
    sweepStopped()
    val it = cached.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }
}
