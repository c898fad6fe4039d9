package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Checkpoint-scoped RUN TOKEN for the replay-safe ingest sinks.
  *
  * `foreachBatch`'s batchId is unique and monotonic only WITHIN one
  * checkpoint: a query restarted against a fresh checkpoint (the
  * "checkpoints are disposable, the lake is the source of truth"
  * operational pattern) counts from 0 again, so partitioning a sink by
  * bare `batch_id` lets incarnation 2's batch 0 dynamically OVERWRITE
  * incarnation 1's batch-0 partition — silent data loss — and an
  * ordering probe filter like `batch_id < 0` excludes the whole
  * standing index, silently missing every cross-incarnation duplicate.
  *
  * The token pins partitions to the checkpoint instead: sinks
  * partition by `(ingest_run, batch_id)`, and probes exclude exactly
  * the current `(token, batchId)` pair — the only rows that must be
  * invisible to a retry are the retry's own first attempt, and
  * set-exclusion needs no ordering across incarnations. The token
  * lives in a sidecar file INSIDE the checkpoint directory, so a
  * JVM-restart retry of the same checkpoint reads the same token and
  * overwrites its own partitions, while a fresh checkpoint mints a
  * fresh token and can never collide with history. */
object RunToken {
  def of(spark: SparkSession, checkpointDir: String): String = {
    val p = new Path(s"$checkpointDir/_graft_run_token")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def read(): String = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    }
    if (fs.exists(p)) read()
    else {
      val t = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      val tmp = new Path(p.getParent, s".${p.getName}.tmp")
      val out = fs.create(tmp, true)
      try out.write(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // rename is atomic on HDFS-like stores; losing the race (two
      // writers on one checkpoint is already operator error, but be
      // safe) means adopting the winner's token
      if (fs.rename(tmp, p)) t else read()
    }
  }
}
