package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.streaming.{IndexMaintenance, ReplaySafeSink}

/** Measures what standing-index compaction buys: build a production-
  * shaped small-files field (`nBatches` micro-batch partitions across
  * `nRuns` retired incarnations plus one live run, `rowsPerBatch`
  * signature rows each), time the standingRows read before and after
  * [[IndexMaintenance.compactIndex]], and verify the probe row-set is
  * IDENTICAL — the economics evidence for the maintenance op, same
  * pattern as the other tools probes.
  *
  * Usage: runMain graft.tools.CompactProbe [nBatches] [rowsPerBatch] */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(200)
    val rowsPerBatch = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "target/compactprobe/index"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)

    // two retired incarnations' worth of batches, then a live one
    val runs = Seq("retiredrun00", "retiredrun01", "liverun00000")
    var b = 0
    while (b < nBatches) {
      val tok = runs(b * runs.length / nBatches)
      val batch = spark.range(b.toLong * rowsPerBatch, (b + 1L) * rowsPerBatch)
        .select(col("id").as("doc_id"),
          xxhash64(col("id")).as("simhash"),
          timestamp_seconds(lit(1704067200L) + col("id") % 86400).as("ts"),
          to_date(timestamp_seconds(lit(1704067200L))).as("d"))
      ReplaySafeSink.writeBatch(batch, dir, tok, (b % (nBatches / runs.length + 1)).toLong,
        leading = Seq("d"))
      b += 1
    }
    def files(): Int = {
      var n = 0
      val it = fs.listFiles(p, true)
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    def timeRead(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val df = ReplaySafeSink.standingRows(spark, dir, "liverun00000", 999L).get
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("simhash")))).head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
    }
    val filesBefore = files()
    timeRead() // warm FS metadata/JIT so before/after are comparable
    val (tBefore, nBefore, xBefore) = timeRead()
    val t0 = System.nanoTime()
    val consolidated = IndexMaintenance.compactIndex(spark, dir, Some("liverun00000"))
    val tCompact = (System.nanoTime() - t0) / 1e9
    val filesAfter = files()
    val (tAfter, nAfter, xAfter) = timeRead()
    require(nBefore == nAfter && xBefore == xAfter,
      s"probe row-set changed: $nBefore/$xBefore -> $nAfter/$xAfter")
    println(s"""{"batches":$nBatches,"rows_per_batch":$rowsPerBatch,""" +
      s""""files_before":$filesBefore,"files_after":$filesAfter,""" +
      s""""partitions_consolidated":$consolidated,""" +
      f""""read_s_before":$tBefore%.2f,"read_s_after":$tAfter%.2f,""" +
      f""""compact_s":$tCompact%.1f,"rowset_identical":true}""")
    spark.stop()
  }
}
