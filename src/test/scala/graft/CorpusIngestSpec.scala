package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.CorpusIngest

/** The unbounded-horizon dedup ledger: duplicates are dropped across
  * micro-batches AND across query restarts, because the seen set lives
  * in storage rather than stream state. */
class CorpusIngestSpec extends SparkSuite {
  import spark.implicits._

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete()
  }

  test("ledger dedups across micro-batches and across query restarts") {
    implicit val sqlCtx = spark.sqlContext
    val base = new java.io.File("target/corpus-ingest-spec")
    rm(base)
    val (ledger, out) = (s"$base/ledger", s"$base/corpus")

    val stream1 = MemoryStream[(Long, String)]
    val q1 = CorpusIngest.ingestWithLedger(
      stream1.toDF().toDF("doc_id", "text"), ledger, out, s"$base/ckpt1")
    try {
      stream1.addData(Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))) // in-batch dup
      q1.processAllAvailable()
      stream1.addData(Seq((4L, "beta"), (5L, "gamma"))) // cross-batch dup
      q1.processAllAvailable()
    } finally q1.stop()

    val afterFirst = spark.read.parquet(out).select("text").as[String].collect().sorted
    assert(afterFirst === Array("alpha", "beta", "gamma"))

    // a brand-new query (fresh state, fresh checkpoint, different
    // stream) must still honor the ledger
    val stream2 = MemoryStream[(Long, String)]
    val q2 = CorpusIngest.ingestWithLedger(
      stream2.toDF().toDF("doc_id", "text"), ledger, out, s"$base/ckpt2")
    try {
      stream2.addData(Seq((6L, "gamma"), (7L, "delta"))) // gamma seen months ago
      q2.processAllAvailable()
    } finally q2.stop()

    val afterRestart = spark.read.parquet(out).select("text").as[String].collect().sorted
    assert(afterRestart === Array("alpha", "beta", "delta", "gamma"))
    // ledger carries one hash per distinct text
    assert(spark.read.parquet(ledger).distinct().count() === 4)
  }

  test("Bloom pre-gate sends only probable hits into the ledger anti join") {
    implicit val sqlCtx = spark.sqlContext
    val base = new java.io.File("target/corpus-ingest-bloom")
    rm(base)
    val (ledger, out) = (s"$base/ledger", s"$base/corpus")
    val stream = MemoryStream[(Long, String)]
    val q = CorpusIngest.ingestWithLedger(
      stream.toDF().toDF("doc_id", "text"), ledger, out, s"$base/ckpt")
    try {
      stream.addData(Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta")))
      q.processAllAvailable()
      // first batch: no ledger exists, nothing reaches a join
      assert(CorpusIngest.lastProbedRows.get() === 0L)
      // pre-populated ledger + a batch of 2 true dups and 3 novel docs:
      // the exact anti join's input must be the Bloom-filtered subset
      // (the dups — no false positive fires at this fpp/scale, and the
      // filter is deterministic), NOT the whole batch
      stream.addData(Seq((5L, "alpha"), (6L, "delta"), (7L, "eps"),
        (8L, "zeta"), (9L, "eta")))
      q.processAllAvailable()
      val probed = CorpusIngest.lastProbedRows.get()
      assert(probed === 2L,
        s"anti join input must be the probable-hit subset, saw $probed of 5")
    } finally q.stop()
    // the gate prunes join INPUT, never decides membership — output exact
    val texts = spark.read.parquet(out).select("text").as[String].collect().sorted
    assert(texts === Array("alpha", "beta", "delta", "eps", "eta", "gamma", "zeta"))
  }
}
