package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Corpus-lake ingest with a persistent exact-dedup LEDGER, via
  * `foreachBatch` — the third dedup horizon:
  *
  *  - in-batch: `dropDuplicates` inside the micro-batch;
  *  - within-watermark: [[EventStream.dedupStream]] — state bounded by
  *    event-time lateness, duplicates beyond it pass;
  *  - UNBOUNDED: this ledger — a duplicate arriving months later (or
  *    after a restart, or from a different stream) is still dropped,
  *    because the seen-hash set lives in storage, not in stream state.
  *
  * Each micro-batch: hash text (md5 — content-keyed like the batch
  * dedup operators), drop in-batch dups, LEFT ANTI join the ledger,
  * append the survivors to the corpus and their hashes to the ledger.
  * `foreachBatch` is the right tool because the body needs batch-only
  * operations (reading back the ledger directory) per micro-batch.
  *
  * Scale shape — the BLOOM PRE-GATE: the anti join's ledger side is
  * the unbounded corpus history, and a plain anti join shuffles it
  * every micro-batch. Instead the batch probes a Bloom filter over the
  * ledger hashes and splits: rows the filter rejects are DEFINITELY
  * novel (Bloom has no false negatives) and skip the join; only
  * probable hits — bounded by true dups + fpp·batch — reach the exact
  * anti join. Exactness is preserved: the filter only prunes the
  * join's input, never decides membership.
  *
  * The filter is MAINTAINED INCREMENTALLY, not rebuilt: it lives at
  * `<ledger>/_bloom/filter.bf` (underscore-hidden, so the parquet
  * reader never sees it), each batch merges a filter over its novel
  * hashes into it (`mergeInPlace` — all filters share the fixed
  * `bloomCapacity`/`bloomFpp` geometry, the merge-compatibility
  * requirement), so per-batch filter cost is O(batch), independent of
  * ledger size. Overfilling past `bloomCapacity` degrades fpp — more
  * join input, never wrong answers. WRITE ORDER IS LOAD-BEARING:
  * corpus → filter → ledger, so a crash anywhere leaves the filter a
  * SUPERSET of the ledger — supersets cost false positives (safe);
  * a subset would hand out false "definitely novel" verdicts and
  * admit duplicates. A missing filter file (first batch after an
  * upgrade, manual deletion) falls back to one rebuild scan of the
  * ledger — same geometry, so later merges stay compatible.
  *
  * Failure honesty: a MISSING ledger directory is the expected first
  * batch (empty ledger); any OTHER read failure (IO error, corrupt
  * footer/filter) propagates and fails the micro-batch so the
  * checkpoint retries it — silently substituting an empty ledger
  * would disable dedup for the batch and admit duplicates permanently.
  *
  * Exactly-once caveat: the three writes are not atomic; a crash
  * between corpus and ledger append re-admits at most one batch's
  * docs on replay (foreachBatch is at-least-once) — idempotent
  * readers dedup on `h`, which the ledger preserves for that purpose. */
object CorpusIngest {

  /** Rows the Bloom pre-gate sent into the exact anti join in the most
    * recent micro-batch (-1 before any batch) — observability/spec
    * hook for the gate's selectivity. */
  val lastProbedRows = new AtomicLong(-1L)

  /** How the last batch obtained its pre-gate filter: "first-batch"
    * (no ledger), "incremental" (persisted filter file), or "rebuilt"
    * (fallback ledger scan). */
  val lastFilterSource = new AtomicReference[String]("unset")

  private def bloomPath(ledgerDir: String) = new Path(s"$ledgerDir/_bloom/filter.bf")

  def ingestWithLedger(docs: DataFrame, ledgerDir: String, outDir: String,
                       checkpointDir: String, bloomFpp: Double = 0.01,
                       bloomCapacity: Long = 1L << 22): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hashed = batch
          .withColumn("h", md5(col("text").cast("binary")))
          .dropDuplicates("h")
        val ledgerPath = new Path(ledgerDir)
        val fs = ledgerPath.getFileSystem(spark.sessionState.newHadoopConf())
        // lives until the corpus/ledger writes complete: `novel` is
        // derived from it, and novel must be CONSISTENT between its two
        // reads (recomputation against a just-updated ledger would see
        // its own writes)
        // ONE filter-construction path (the distributed aggregate) with
        // ONE explicit geometry: Spark's aggregate clamps numBits at
        // spark.sql.optimizer.runtime.bloomFilter.maxNumBits and derives
        // its hash count differently from BloomFilter.create, so mixing
        // paths (or letting fpp size the bits implicitly) produces
        // filters mergeInPlace refuses. Capacity past the bit clamp
        // degrades fpp — more join input, never wrong answers. A filter
        // file written under a DIFFERENT conf clamp fails the merge and
        // therefore the batch: resetFilter() is the remedy.
        val numBits = math.min(
          math.ceil(-bloomCapacity * math.log(bloomFpp) / (math.log(2) * math.log(2))).toLong,
          spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong)
        val toRelease = scala.collection.mutable.ListBuffer.empty[DataFrame]
        try {
          val (novel, standing) =
            if (!fs.exists(ledgerPath)) { // first batch: no ledger yet
              lastProbedRows.set(0L)
              lastFilterSource.set("first-batch")
              (hashed, None: Option[BloomFilter])
            } else {
              val ledger = spark.read.parquet(ledgerDir).select("h")
              val bp = bloomPath(ledgerDir)
              val filter =
                if (fs.exists(bp)) {
                  val in = fs.open(bp)
                  try { lastFilterSource.set("incremental"); BloomFilter.readFrom(in) }
                  finally in.close()
                } else {
                  lastFilterSource.set("rebuilt")
                  ledger.stat.bloomFilter("h", bloomCapacity, numBits)
                }
              val bloomBc = spark.sparkContext.broadcast(filter)
              val mightContain = udf((h: String) => bloomBc.value.mightContain(h))
              val flagged = hashed.withColumn("probable", mightContain(col("h")))
              flagged.persist(); toRelease += flagged
              val probable = flagged.filter(col("probable")).drop("probable")
              lastProbedRows.set(probable.count())
              (flagged.filter(!col("probable")).drop("probable")
                .unionByName(probable.join(ledger, Seq("h"), "left_anti")),
                Some(filter))
            }
          novel.persist(); toRelease += novel
          novel.drop("h").write.mode(SaveMode.Append).parquet(outDir)
          // merge the batch's novel hashes into the standing filter and
          // persist it BEFORE the ledger append (superset invariant)
          val batchFilter = novel.stat.bloomFilter("h", bloomCapacity, numBits)
          standing.foreach(batchFilter.mergeInPlace)
          writeFilter(fs, bloomPath(ledgerDir), batchFilter)
          novel.select("h").write.mode(SaveMode.Append).parquet(ledgerDir)
        } finally toRelease.foreach(_.unpersist())
      }
      .start()

  /** Serialize via temp file + rename (atomic on HDFS-like stores), so
    * a crash mid-write leaves the previous filter, not a torn one. */
  private def writeFilter(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                          filter: BloomFilter): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try filter.writeTo(out) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Drop the persisted pre-gate filter (forces a rebuild scan on the
    * next batch) — maintenance hook, e.g. after manually compacting or
    * rewriting the ledger. */
  def resetFilter(spark: SparkSession, ledgerDir: String): Unit = {
    val p = bloomPath(ledgerDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, false)
  }
}
