package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import scala.util.control.NonFatal

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
  * Scale shape: the anti join is hash-keyed (16-byte md5); at lake
  * scale the ledger becomes a bucketed table (or a Bloom-filter
  * pre-gate) so each ingest batch probes, never scans — the seam is
  * this one join. Exactly-once caveat: append + ledger-append are two
  * writes; a crash between them re-admits at most one batch's docs on
  * replay (foreachBatch is at-least-once) — idempotent readers dedup
  * on `h`, which the ledger preserves for that purpose. */
object CorpusIngest {

  def ingestWithLedger(docs: DataFrame, ledgerDir: String, outDir: String,
                       checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hashed = batch
          .withColumn("h", md5(col("text").cast("binary")))
          .dropDuplicates("h")
        val ledger =
          try spark.read.parquet(ledgerDir).select("h")
          catch { case NonFatal(_) => // first batch: no ledger yet
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              hashed.select("h").schema)
          }
        val novel = hashed.join(ledger, Seq("h"), "left_anti")
        // cache: novel is read twice (corpus append + ledger append) and
        // must be CONSISTENT between them — recomputation against a
        // just-updated ledger would see its own writes
        novel.persist()
        try {
          novel.drop("h").write.mode(SaveMode.Append).parquet(outDir)
          novel.select("h").write.mode(SaveMode.Append).parquet(ledgerDir)
        } finally novel.unpersist()
      }
      .start()
}
