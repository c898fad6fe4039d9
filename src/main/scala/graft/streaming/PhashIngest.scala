package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Documents, Multimodal}

/** Streaming PERCEPTUAL media dedup — the multimodal twin of
  * [[NearDupIngest]], covering both images ([[ingestImageDedup]],
  * dHash) and audio ([[ingestAudioDedup]], aHash): arriving payloads
  * are decoded and hashed ([[Multimodal.dHash64]] /
  * [[Multimodal.aHash64]] — all-integer, so the signature is
  * bit-identical however the media reaches the stream), and any
  * arrival whose hash sits within `maxHamming` of a standing-index
  * signature inside the lateness horizon is DROPPED before it reaches
  * the corpus. A dHash is a 64-bit locality signature, so the probe
  * and in-batch passes reuse the text tier's banded Hamming joins
  * ([[Documents.simhashProbe]] / [[Documents.simhashPairs]])
  * unchanged — the image stream inherits the text stream's
  * O(|batch| + band collisions) economics, never a corpus self-join.
  *
  * Shape per micro-batch: decode+hash (the partition-batched media
  * seam — per-row imperative byte work with no Catalyst equivalent),
  * probe the standing index, greedy in-batch pair drop (keep the
  * smaller doc_id, the [[NearDupIngest]] convention), then write
  * survivors to the corpus and their signatures to the index.
  * UNDECODABLE payloads are admitted to the corpus but not indexed:
  * an ingest must never lose data it cannot read, and a signature it
  * cannot compute can't be probed — route such rows to a quarantine
  * audit downstream if the pipeline needs one.
  *
  * Replay safety follows the [[LeakageIngest]] recipe: both sinks are
  * partitioned by ([[RunToken]], batch_id) and written with dynamic
  * partition OVERWRITE, and the standing-index probe excludes exactly
  * the current (token, batchId) pair, so a checkpoint retry of batch N
  * — before, between, or after its two writes — reproduces exactly the
  * first attempt's partitions against exactly the pre-batch index
  * state, and a fresh-checkpoint incarnation (batchId back at 0) can
  * neither clobber history nor lose the standing index from its
  * probes. Empty micro-batches are skipped.
  *
  * The watermark bound, date-partitioned index layout and retention
  * (reuse [[NearDupIngest.expireIndex]]) are identical to the text
  * ingest: only signatures within `watermarkMs` of the batch's max
  * event time are probed, so per-batch state is horizon-bounded; a
  * near-duplicate image arriving beyond the horizon is admitted —
  * run the batch [[Multimodal.multimodalDedupPhash]] over the lake
  * for the unbounded answer. */
object PhashIngest {

  /** The perceptual signature per media mode — both are 64-bit
    * locality hashes, so everything downstream of this one map is
    * shared. `None` ⇔ undecodable. */
  private def sigOf(mode: String, bytes: Array[Byte]): Option[Long] = mode match {
    // container-sniffing decode (BMP magic or real compressed PNG), so
    // a PNG re-encode of a BMP image — or any cross-container clone —
    // lands on the same signature and is dropped like a same-format dup
    case "image" => Multimodal.MediaTransform.pixelsOf(bytes)
      .map { case (w, h, px) => Multimodal.dHash64(px, w, h) }
    case "audio" => Multimodal.MediaTransform.wavSamples(bytes)
      // a structurally valid EMPTY wav (44-byte header, dataLen=0)
      // decodes to 0 frames — no loudness sequence to hash. Treat it
      // as undecodable (admit, don't index) rather than throwing:
      // an exception here fails the micro-batch and the checkpoint
      // retries the same poison pill forever
      .filter { case (_, _, frames, _) => frames > 0 }
      .map { case (_, c, _, s) => Multimodal.aHash64(s, c) }
    // the temporal hash discriminates only past ~65 frames (see
    // tHash64); shorter clips are admitted un-indexed like any other
    // payload the mode cannot signature
    case "video" => graft.operators.AviCodec.decode(bytes)
      .filter { case (_, _, _, frames) => frames.length >= 65 }
      .map { case (_, _, _, frames) => Multimodal.tHash64(frames) }
    case m => throw new IllegalArgumentException(s"unknown media mode '$m'")
  }

  /** Input stream columns: `doc_id` (long), `ts` (timestamp), `media`
    * (binary image payload — BMP or real compressed PNG, sniffed per
    * row via [[Multimodal.MediaTransform.pixelsOf]]). */
  def ingestImageDedup(media: DataFrame, indexDir: String, outDir: String,
                       checkpointDir: String, maxHamming: Int = 4,
                       watermarkMs: Long = 2L * 3600 * 1000): StreamingQuery =
    ingest(media, "image", indexDir, outDir, checkpointDir, maxHamming, watermarkMs)

  /** The audio twin: same standing index shape over [[Multimodal
    * .aHash64]] signatures, so a re-encoded or integer-resampled clip
    * arriving within the horizon is dropped like a re-encoded image. */
  def ingestAudioDedup(media: DataFrame, indexDir: String, outDir: String,
                       checkpointDir: String, maxHamming: Int = 4,
                       watermarkMs: Long = 2L * 3600 * 1000): StreamingQuery =
    ingest(media, "audio", indexDir, outDir, checkpointDir, maxHamming, watermarkMs)

  /** The video twin: [[Multimodal.tHash64]] over the decoded AVI
    * frame sequence — a re-contained or fps-resampled clip arriving
    * within the horizon is dropped; clips too short to signature
    * (< 65 frames) are admitted un-indexed. */
  def ingestVideoDedup(media: DataFrame, indexDir: String, outDir: String,
                       checkpointDir: String, maxHamming: Int = 4,
                       watermarkMs: Long = 2L * 3600 * 1000): StreamingQuery =
    ingest(media, "video", indexDir, outDir, checkpointDir, maxHamming, watermarkMs)

  private def ingest(media: DataFrame, mode: String, indexDir: String,
                     outDir: String, checkpointDir: String, maxHamming: Int,
                     watermarkMs: Long): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId,
          RunToken.of(batch.sparkSession, checkpointDir),
          mode, indexDir, outDir, maxHamming, watermarkMs)
      }
      .start()

  /** The per-micro-batch body, callable directly so specs can REPLAY a
    * committed batchId (the [[LeakageIngest.processBatch]] pattern). */
  private[graft] def processBatch(batch: DataFrame, batchId: Long, runToken: String,
                                  mode: String, indexDir: String, outDir: String,
                                  maxHamming: Int, watermarkMs: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // one row per doc_id up front: equal ids never pair in the strict
    // d1 < d2 in-batch pass, so a doubly-delivered doc would survive
    // twice AND multiply quadratically through the corpus join below
    val uniq = batch.select(col("doc_id"), col("ts"), col("media"))
      .dropDuplicates("doc_id")
    val sigs = uniq
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, ts, bytes) => (id, ts, sigOf(mode, bytes)) }
      }
      .toDF("doc_id", "ts", "simhash") // simhash null ⇔ undecodable
    sigs.persist()
    try if (!sigs.isEmpty) {
      val hashed = sigs.filter(col("simhash").isNotNull)
      val afterProbe =
        ReplaySafeSink.standingRows(spark, indexDir, runToken, batchId) match {
          case None => hashed // no index (yet, or fully expired)
          case Some(standing) =>
            val maxTs = sigs.agg(max(col("ts"))).head().getTimestamp(0)
            val cutoff = new java.sql.Timestamp(maxTs.getTime - watermarkMs)
            // ts >= cutoff prunes expired date partitions at planning
            // time; the retry self-exclusion lives in
            // ReplaySafeSink.standingRows
            val index = standing.filter(col("ts") >= lit(cutoff))
              .select(col("doc_id"), col("simhash"))
            val dup = Documents.simhashProbe(
              hashed.select("doc_id", "simhash"), index, maxHamming)
            hashed.join(dup, Seq("doc_id"), "left_anti")
        }
      val inBatchDrop = Documents
        .simhashPairs(afterProbe.select("doc_id", "simhash"), maxHamming)
        .select(col("d2").as("doc_id")).distinct()
      val surviving = afterProbe.join(inBatchDrop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("ts"), col("simhash"))
        .unionByName(sigs.filter(col("simhash").isNull)) // admit, don't index
      // corpus keeps the original payload: join survivor ids back to
      // the (deduplicated) batch rather than carrying media bytes
      // through the joins
      ReplaySafeSink.writeBatch(
        uniq.join(surviving.select("doc_id"), Seq("doc_id")),
        outDir, runToken, batchId)
      ReplaySafeSink.writeBatch(
        surviving.filter(col("simhash").isNotNull)
          .select(col("doc_id"), col("simhash"), col("ts"),
            to_date(col("ts")).as("d")),
        indexDir, runToken, batchId, leading = Seq("d"))
    } finally sigs.unpersist()
    // standing-index hygiene on the crawl ledger's cadence — same
    // replay-safety argument as [[CrawlIngest]] (only this batch can
    // retry; its partition stays live), same `d`-leading preservation
    // as the probe's partition pruning requires.
    IndexMaintenance.autoCompact(spark, indexDir, runToken, batchId)
  }
}
