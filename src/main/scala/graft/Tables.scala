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

  /** The physical type of `events.ts` is environment-owned and has
    * changed underneath the repo once already (TIMESTAMP(NANOS) →
    * timestamp[us]), so the loader branches on the schema it actually
    * read rather than assuming either layout. [[normalizeTs]] is the
    * single place that branch lives; the streaming twin
    * ([[graft.streaming.EventStream.readEvents]]) reuses it so batch
    * and stream can never diverge. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))

  /** Normalize an events frame so `ts` is always session-TZ
    * `TimestampType`, whatever the file stored:
    *
    *  - `LongType`: raw int64 nanos (TIMESTAMP(NANOS) read via the
    *    legacy `nanosAsLong` conf set in [[GraftSession.builder]] —
    *    Spark 4 refuses NANOS outright without it). Truncate to µs with
    *    integer division — `ts div 1000`, not a double divide, because
    *    epoch-ns (~1.7e18) exceeds the 2^53 double mantissa and would
    *    corrupt low-order digits. DuckDB applies the same ns→µs
    *    truncation, so the oracle agrees.
    *  - `TimestampNTZType`: parquet timestamp[us] with
    *    isAdjustedToUTC=false (what pandas/pyarrow write by default).
    *    Cast to session-TZ timestamp; the session TZ is pinned UTC
    *    ([[GraftSession]]), so the cast is value-preserving and matches
    *    DuckDB's naive read.
    *  - `TimestampType`: already what we want — pass through.
    *  - anything else: fail with a named error. A silent mis-read here
    *    cost eight queries in round 6; unknown drift must be loud. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — supported: " +
        "int64 nanos (legacy nanosAsLong), timestamp[us] (NTZ), timestamp (LTZ). " +
        "The testdata schema drifted; extend Tables.normalizeTs.")
    }

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
        // Parquet split planning gives a compact file a handful of
        // scan partitions (measured: lineitem at sf0.1 cached as 3),
        // and the InMemoryRelation inherits them — so every partial
        // aggregate over a preloaded table ran at ≤3-way parallelism
        // regardless of session width (agg_approx_distinct's partial
        // stage: one 826 ms task, two idle cores ×29). Spread files
        // big enough to matter round-robin across the session's
        // parallelism AT LOAD TIME (the one-time cost the bench's
        // load_s line already charges); the cutoff derives from the
        // file's size, not a fixed table list, so it scales with the
        // data and the dims stay single-partition.
        val raw = load(spark, dir, n)
        val big = new java.io.File(s"$dir/$n.parquet").length() > (1L << 20)
        val df = (if (big) raw.repartition(spark.sparkContext.defaultParallelism)
                  else raw).cache()
        df.count() // force materialization
        cached.put((spark, dir, n), df)
      } catch { case NonFatal(e) =>
        System.err.println(s"[tables] preload skipped $n: ${e.getMessage}")
      }
    }
    // Deliberately NOT spread: the `except` tables (documents /
    // embeddings). Measured (r16): a round-robin spread of the corpus
    // moved the single-task shingle stage to 32 tasks but total wall
    // was flat-to-worse — the interpreted HOF shingle work is
    // allocation-bound, so 32 concurrent tasks contended on the
    // allocator for no net gain, while every query paid an extra
    // corpus exchange. The per-row cost is attacked in the expression
    // layer instead (codegen shingle hashing).
  }

  /** Drop this session's preloaded entries (returns [[load]] to its
    * side-effect-free read-from-disk behavior). */
  def clearPreload(spark: SparkSession): Unit = {
    sweepStopped()
    val it = cached.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }
}
