package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-appropriate defaults.
  *
  * Local mode is a stand-in for a multi-executor cluster: shuffle
  * partitions track core count (not the 200 default), AQE is on so
  * skewed shuffles re-plan at runtime, and the session time zone is
  * pinned to UTC for oracle parity (reference parses dates in local
  * TZ — documented divergence, SURVEY.md §7.2.6).
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // SQL surface for the native codegen expressions (vec_dot,
      // simhash64, minhash_sig); cluster deployments get the same via
      // --conf spark.sql.extensions=graft.functions.GraftExtensions
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Some events.parquet generations carry TIMESTAMP(NANOS), which
      // Spark 4 refuses without this conf; with it they read as raw
      // int64 ns and Tables.normalizeTs converts. Harmless for the
      // timestamp[us] generations (the conf only touches NANOS).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // catalog-managed (e.g. bucketed) tables land under target/, not
      // the repo root; cluster deployments override with their real
      // warehouse path
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/spark-warehouse").getAbsolutePath)
      // the ingest Bloom pre-gate's geometry grows with its ledger
      // (CorpusIngest); the default 2^26-bit clamp caps growth at ~7M
      // entries at 1% fpp — raise to 2^30 bits (128 MiB broadcast at
      // the ceiling, ~750M entries) so regrowth has headroom
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        (1L << 30).toString)
      .config("spark.ui.enabled", "false")
}
