package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.util.concurrent.atomic.AtomicLong

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
  * every micro-batch. Instead each batch builds a Bloom filter over
  * the ledger hashes (one scan, a treeAggregate — no shuffle, fixed
  * memory) and splits the batch: rows the filter rejects are
  * DEFINITELY novel (Bloom has no false negatives) and skip the join;
  * only probable hits — bounded by true dups + fpp·batch — reach the
  * exact anti join, so the join input collapses from batch-size to
  * ~dup-size. Exactness is preserved: the filter only prunes the
  * join's input, never decides membership. At lake scale the filter
  * would be maintained incrementally (merge per-batch filters) rather
  * than rebuilt; the rebuild keeps this self-contained and is still
  * one sequential scan, not a shuffle.
  *
  * Failure honesty: a MISSING ledger directory is the expected first
  * batch (empty ledger); any OTHER read failure (IO error, corrupt
  * footer) propagates and fails the micro-batch so the checkpoint
  * retries it — silently substituting an empty ledger would disable
  * dedup for the batch and admit duplicates permanently.
  *
  * Exactly-once caveat: append + ledger-append are two writes; a crash
  * between them re-admits at most one batch's docs on replay
  * (foreachBatch is at-least-once) — idempotent readers dedup on `h`,
  * which the ledger preserves for that purpose. */
object CorpusIngest {

  /** Rows the Bloom pre-gate sent into the exact anti join in the most
    * recent micro-batch (-1 before any batch) — observability/spec
    * hook for the gate's selectivity. */
  val lastProbedRows = new AtomicLong(-1L)

  def ingestWithLedger(docs: DataFrame, ledgerDir: String, outDir: String,
                       checkpointDir: String, bloomFpp: Double = 0.01): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hashed = batch
          .withColumn("h", md5(col("text").cast("binary")))
          .dropDuplicates("h")
        val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
        val fs = ledgerPath.getFileSystem(spark.sessionState.newHadoopConf())
        // lives until the corpus/ledger writes complete: `novel` is
        // derived from it, and novel must be CONSISTENT between its two
        // reads (recomputation against a just-updated ledger would see
        // its own writes)
        val toRelease = scala.collection.mutable.ListBuffer.empty[DataFrame]
        try {
          val novel =
            if (!fs.exists(ledgerPath)) { // first batch: no ledger yet
              lastProbedRows.set(0L)
              hashed
            } else {
              val ledger = spark.read.parquet(ledgerDir).select("h")
              // expected-items from the parquet row count (metadata-cheap)
              val bloom = ledger.stat.bloomFilter(
                "h", math.max(ledger.count(), 64L), bloomFpp)
              val bloomBc = spark.sparkContext.broadcast(bloom)
              val mightContain = udf((h: String) => bloomBc.value.mightContain(h))
              val flagged = hashed.withColumn("probable", mightContain(col("h")))
              flagged.persist(); toRelease += flagged
              val probable = flagged.filter(col("probable")).drop("probable")
              lastProbedRows.set(probable.count())
              flagged.filter(!col("probable")).drop("probable")
                .unionByName(probable.join(ledger, Seq("h"), "left_anti"))
            }
          novel.persist(); toRelease += novel
          novel.drop("h").write.mode(SaveMode.Append).parquet(outDir)
          novel.select("h").write.mode(SaveMode.Append).parquet(ledgerDir)
        } finally toRelease.foreach(_.unpersist())
      }
      .start()
}
