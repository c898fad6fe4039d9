package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, split, to_date}

import graft.operators.Documents
import graft.streaming.{IndexMaintenance, NearDupIngest, ReplaySafeSink, RunToken}

/** Standing-store maintenance: pre-RunToken layout migration and
  * small-file compaction, both of which must be INVISIBLE to the
  * replay-exclusion contract — probe row-sets identical before and
  * after, retries still idempotent. */
class IndexMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete()
  }

  private var seed = 7L
  private def nextInt(n: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % n).toInt + n) % n
  }
  private def freshText(prefix: String) =
    (0 until 60).map(_ => s"$prefix${nextInt(100000)}").mkString(" ")
  private def nearDup(t: String) = {
    val toks = t.split(" "); toks(7) = "zulu"; toks(31) = "yankee"; toks.mkString(" ")
  }
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def docsDf(rows: (Long, java.sql.Timestamp, String)*): DataFrame =
    spark.createDataFrame(rows).toDF("doc_id", "ts", "text")
  private def parquetFiles(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else {
      val out = Seq.newBuilder[String]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next().getPath.toString
        if (f.endsWith(".parquet")) out += f
      }
      out.result()
    }
  }

  test("legacy (pre-RunToken) index fails standingRows with a remedy; migration heals it") {
    val base = new java.io.File("target/index-migrate-spec")
    rm(base)
    val index = s"$base/index"
    val (a, b) = (freshText("apple"), freshText("berry"))
    // a pre-round-12 index: partitioned by bare `d`, no run/batch levels
    docsDf((1L, ts("2024-01-01 10:00:00"), a), (2L, ts("2024-01-01 10:00:01"), b))
      .select(col("doc_id"),
        graft.functions.VectorExpressions.simhash64(split(col("text"), " ")).as("simhash"),
        col("ts"), to_date(col("ts")).as("d"))
      .write.partitionBy("d").parquet(index)
    // mixing layouts must fail LOUDLY with the migration named, not
    // with Spark's raw partition-discovery error after a new-layout
    // batch lands next to the legacy files
    val e = intercept[IllegalStateException] {
      ReplaySafeSink.standingRows(spark, index, "sometoken", 0L)
    }
    assert(e.getMessage.contains("migrateLegacyIndex"), e.getMessage)
    assert(IndexMaintenance.migrateLegacyIndex(spark, index) > 0)
    assert(IndexMaintenance.migrateLegacyIndex(spark, index) === 0, "second run is a no-op")
    // the migrated rows are a probe-visible standing index again: a
    // near-dup of legacy doc 1 must be dropped by a post-migration batch
    NearDupIngest.processBatch(
      docsDf((3L, ts("2024-01-01 10:30:00"), nearDup(a)),
        (4L, ts("2024-01-01 10:30:01"), freshText("cedar"))),
      0L, "newrun", index, s"$base/corpus",
      maxHamming = 12, watermarkMs = 2L * 3600 * 1000)
    val corpus = spark.read.parquet(s"$base/corpus")
      .select("doc_id").as[Long].collect().sorted
    assert(corpus === Array(4L), s"got ${corpus.toSeq}")
    // migrated rows sit under the retired partition — never a live pair
    val runs = spark.read.parquet(index)
      .select("ingest_run").distinct().as[String].collect().toSet
    assert(runs === Set(IndexMaintenance.MigrationRun, "newrun"))
    // leading `d` level survived migration (retention still a dir drop)
    assert(parquetFiles(index).forall(_.contains("/d=")), "date level must stay leading")
  }

  test("compaction consolidates retired runs; probes identical, retry still idempotent") {
    val base = new java.io.File("target/index-compact-spec")
    rm(base)
    val (index, corpus) = (s"$base/index", s"$base/corpus")
    val texts = (0 until 6).map(i => freshText(s"t$i"))
    def run(tok: String, id: Long, rows: (Long, java.sql.Timestamp, String)*) =
      NearDupIngest.processBatch(docsDf(rows: _*), id, tok, index, corpus,
        maxHamming = 12, watermarkMs = 24L * 3600 * 1000)
    // an OLD incarnation wrote three batches, the LIVE one has written
    // two so far — five (run, batch) partitions across two days
    run("oldrun000000", 0L, (1L, ts("2024-01-01 10:00:00"), texts(0)))
    run("oldrun000000", 1L, (2L, ts("2024-01-01 11:00:00"), texts(1)))
    run("oldrun000000", 2L, (3L, ts("2024-01-02 09:00:00"), texts(2)))
    run("liverun00000", 0L, (4L, ts("2024-01-02 10:00:00"), texts(3)))
    run("liverun00000", 1L, (5L, ts("2024-01-02 11:00:00"), texts(4)))
    val before = ReplaySafeSink.standingRows(spark, index, "liverun00000", 2L).get
      .select("doc_id", "simhash").as[(Long, Long)].collect().toSet
    val filesBefore = parquetFiles(index).size
    val n = IndexMaintenance.compactIndex(spark, index, Some("liverun00000"))
    assert(n === 3, s"three retired (run,batch) partitions expected, got $n")
    val after = ReplaySafeSink.standingRows(spark, index, "liverun00000", 2L).get
      .select("doc_id", "simhash").as[(Long, Long)].collect().toSet
    assert(after === before, "probe row-set must be identical pre/post compaction")
    assert(parquetFiles(index).size < filesBefore, "compaction must shrink the file count")
    // the LIVE run's partitions are untouched — its rows still sit
    // under their original (token, batch_id) pairs so a retry's dynamic
    // overwrite and self-exclusion both still target them
    val livePaths = parquetFiles(index).filter(_.contains("ingest_run=liverun00000"))
    assert(livePaths.exists(_.contains("batch_id=0")) &&
      livePaths.exists(_.contains("batch_id=1")), s"live partitions rewritten: $livePaths")
    // leading date level survives (retention stays a directory drop)
    assert(parquetFiles(index).forall(_.contains("/d=")), "date level must stay leading")
    // a checkpoint RETRY of the live run's last committed batch, after
    // compaction, must reproduce corpus and index exactly
    val (c1, i1) = (spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted,
      spark.read.parquet(index).select("doc_id", "simhash").as[(Long, Long)].collect().toSet)
    run("liverun00000", 1L, (5L, ts("2024-01-02 11:00:00"), texts(4)))
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted === c1)
    assert(spark.read.parquet(index).select("doc_id", "simhash")
      .as[(Long, Long)].collect().toSet === i1)
    // and the consolidated signatures still CATCH a near-dup of an
    // old-incarnation doc — compaction must not blind the probe
    run("liverun00000", 2L, (9L, ts("2024-01-02 12:00:00"), nearDup(texts(2))),
      (10L, ts("2024-01-02 12:00:01"), freshText("fresh")))
    val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L, 3L, 4L, 5L, 10L), s"got ${ids.toSeq}")
    // a second compaction has one retired partition (the previous
    // generation) — churn, not compaction: no-op by contract
    assert(IndexMaintenance.compactIndex(spark, index, Some("liverun00000")) === 0)
    // decommissioned store (no live ingest): everything consolidates
    assert(IndexMaintenance.compactIndex(spark, index, None) >= 2)
    val finalRows = spark.read.parquet(index)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toSet
    assert(finalRows.map(_._1) === Set(1L, 2L, 3L, 4L, 5L, 10L))
  }
}
