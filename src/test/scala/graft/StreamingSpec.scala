package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured Streaming semantics via MemoryStream: the windowed agg
  * must match its batch twin, and stateful per-user totals must fold
  * across micro-batches. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
    Event(2, ts("2024-01-01 10:20:00"), 1, "click", 2.0),
    Event(3, ts("2024-01-01 10:40:00"), 2, "view", 3.0),
    Event(4, ts("2024-01-01 11:10:00"), 2, "click", 4.0))
  private val batch2 = Seq(
    Event(5, ts("2024-01-01 11:30:00"), 1, "view", 5.0),
    Event(6, ts("2024-01-01 12:05:00"), 3, "click", 6.0))

  test("streaming windowedCounts matches the batch plan on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
      val streamed = spark.table("win_test")
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventStream.windowedCounts((batch1 ++ batch2).toDF())
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(streamed === batch)
      assert(streamed.map(_._3).sum === 6L)
    } finally q.stop()
  }

  test("streaming HOPPING windows match the batch sliding plan on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.windowedCounts(stream.toDF(), slide = "15 minutes")
      .writeStream.format("memory").queryName("hop_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      val streamed = spark.table("hop_test")
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventStream.windowedCounts((batch1 ++ batch2).toDF(),
          slide = "15 minutes")
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(streamed === batch)
      // every event lands in exactly 4 windows
      assert(streamed.map(_._3).sum === 4L * (batch1.size + batch2.size))
    } finally q.stop()
  }

  test("streaming corpus scrub equals the batch scrub on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "Contact bob@example.com about the contract and the meeting notes today", "en"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam", "en"),
      (3L, "the quick brown fox jumps over a lazy dog near the old mill and rests", "en"),
      (4L, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____", "xx"))
    val stream = MemoryStream[(Long, String, String)]
    val q = graft.operators.Documents
      .scrubDocs(stream.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName("scrub_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(rows.take(2)); q.processAllAvailable()
      stream.addData(rows.drop(2)); q.processAllAvailable()
      val streamed = spark.table("scrub_test")
        .select("doc_id", "quality").as[(Long, Double)].collect().sortBy(_._1)
      val batch = graft.operators.Documents
        .scrubDocs(rows.toDF("doc_id", "text", "lang"))
        .select("doc_id", "quality").as[(Long, Double)].collect().sortBy(_._1)
      assert(streamed.toSeq === batch.toSeq,
        "stateless scrub must be micro-batch invariant")
      assert(streamed.map(_._1).contains(3L), "clean prose survives")
      assert(!streamed.map(_._1).contains(4L), "symbol soup is gated out")
    } finally q.stop()
  }

  test("streaming token-budget admission equals the batch twin on ordered replay, and never overspends") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.BudgetIngest
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
      .select("doc_id", "source", "text")
    // the batch twin's budget formula and its answer
    val batch = graft.operators.Documents.tokenBudgetMix(docs, frac = 0.1)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    val sized = docs.select(col("doc_id"), col("source"),
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")).cast("long").as("n"))
    val srcBudget = {
      val r = sized.agg(
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.sum("n") * 0.1 /
            org.apache.spark.sql.functions.countDistinct("source")).cast("long")).head()
      r.getLong(0)
    }
    // replay in the batch twin's content-keyed order, split across
    // three micro-batches
    val ordered = docs
      .orderBy(org.apache.spark.sql.functions.md5(col("text").cast("binary")),
        col("doc_id"))
      .as[(Long, String, String)].collect()
      .map { case (id, src, text) => BudgetIngest.Doc(id, src, text) }
    val stream = MemoryStream[BudgetIngest.Doc]
    val q = BudgetIngest.admitWithBudget(stream.toDS(), srcBudget)
      .writeStream.format("memory").queryName("budget_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val third = (ordered.length + 2) / 3
      ordered.grouped(third).foreach { chunk =>
        stream.addData(chunk.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("budget_test")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed === batch,
        "ordered replay must reproduce the batch token-budget mix exactly")
      // the production invariant, order-independent: never overspend
      val spentPerSource = streamed.groupBy(_._2).map { case (s, rows) =>
        s -> rows.map(_._3).sum }
      assert(spentPerSource.values.forall(_ <= srcBudget),
        s"admitted tokens must fit the budget $srcBudget: $spentPerSource")
    } finally q.stop()
  }

  test("streaming shard manifest equals the batch manifest after N micro-batches, any order") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.ManifestIngest
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
      .select("doc_id", "text")
    val batch = graft.operators.Documents.shardManifest(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    // DELIBERATELY shuffled replay (reverse doc_id order), uneven
    // micro-batches: xor/count/sum merges make the standing manifest
    // order-independent — the stronger-than-ordered-replay contract.
    val rows = docs.orderBy(col("doc_id").desc)
      .as[(Long, String)].collect()
      .map { case (id, text) => ManifestIngest.Doc(id, text) }
    val stream = MemoryStream[ManifestIngest.Doc]
    val q = ManifestIngest.maintainManifest(stream.toDS())
      .writeStream.format("memory").queryName("manifest_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      Seq(rows.take(7), rows.slice(7, 100), rows.drop(100)).foreach { chunk =>
        stream.addData(chunk.toSeq); q.processAllAvailable()
      }
      // latest row per shard = the standing manifest (n_docs grows
      // monotonically per shard, so max-by-count is the latest row
      // without leaning on the memory sink's row order)
      val streamed = spark.table("manifest_test")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).map(_._2.maxBy(_._2)).toSet
      assert(streamed === batch,
        "the standing manifest must equal shardManifest(corpus) after the stream drained")
    } finally q.stop()
  }

  test("streaming quality-model scores equal the batch operator's, doc for doc") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, SparkSpec.sfTiny, "documents")
      .select("doc_id", "text")
    val batch = graft.operators.Documents.qualityModelScore(
      Tables.load(spark, SparkSpec.sfTiny, "documents"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val rows = docs.as[(Long, String)].collect()
    val stream = MemoryStream[(Long, String)]
    val q = graft.operators.Documents
      .scoreDocsStream(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qmodel_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      Seq(rows.take(100), rows.drop(100)).foreach { chunk =>
        stream.addData(chunk.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("qmodel_test")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed === batch,
        "the stateless streaming projection must reproduce the batch explode->join->agg scores")
    } finally q.stop()
  }

  test("streaming histogram equals the batch histogram on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 40L).map(i => (i, Seq.fill(i.toInt)("w").mkString(" "), "en"))
    val stream = MemoryStream[(Long, String, String)]
    val q = graft.operators.Documents
      .corpusHistogramStream(stream.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName("hist_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      stream.addData(rows.take(15)); q.processAllAvailable()
      stream.addData(rows.drop(15)); q.processAllAvailable()
      val streamed = spark.table("hist_test")
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
      val batch = graft.operators.Documents
        .corpusHistogramStream(rows.toDF("doc_id", "text", "lang"))
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
      assert(streamed === batch, "histogram must fold across micro-batches")
      assert(streamed.map(_._2).sum === 40L)
      // and the registered batch query's buckets agree (pct aside)
      val full = graft.operators.Documents
        .corpusHistogram(rows.toDF("doc_id", "text", "lang"))
        .select("bucket_lo", "n_docs").as[(Long, Long)].collect().toSeq.sortBy(_._1)
      assert(full === streamed)
    } finally q.stop()
  }

  test("streaming Misra-Gries sketch keeps the heavy hitter across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // 300 copies of one token (~12.5% of 2400) drowned in unique noise,
    // split so the noise floods arrive in different micro-batches than
    // much of the heavy mass — the state-store fold must preserve the
    // superset guarantee across the slicing (bound: survives > n/(k+1)
    // = 4.8%).
    val heavy = (1L to 300L).map(i => (i, "heavy heavy heavy heavy"))
    val noise = (1L to 300L).map(i => (1000L + i,
      (0 until 4).map(j => s"n${i}_$j").mkString(" ")))
    val stream = MemoryStream[(Long, String)]
    val q = graft.operators.Documents
      .heavyHitterSketchStream(stream.toDF().toDF("doc_id", "text"), k = 20)
      .writeStream.format("memory").queryName("hh_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      stream.addData(heavy.take(30) ++ noise.take(200)); q.processAllAvailable()
      stream.addData(noise.drop(200) ++ heavy.drop(30)); q.processAllAvailable()
      val (keys, total) = spark.table("hh_test")
        .selectExpr("map_keys(mg)", "total")
        .as[(Seq[String], Long)].head()
      assert(total === 2400L)
      assert(keys.size <= 20, s"sketch exceeded its k budget: ${keys.size}")
      assert(keys.contains("heavy"),
        "a 12.5% token must survive the cross-micro-batch fold")
    } finally q.stop()
  }

  test("watermark drops events later than the lateness bound") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // 1h window + 2h watermark: once max(ts) reaches 14:00, windows
    // ending before 12:00 are finalized; an event at 09:30 then
    // arriving is beyond the watermark and must be dropped.
    val q = EventStream.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(Seq(
        Event(1, ts("2024-01-01 09:10:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 14:00:00"), 1, "click", 1.0)))
      q.processAllAvailable()
      stream.addData(Seq(Event(3, ts("2024-01-01 09:30:00"), 1, "click", 99.0)))
      q.processAllAvailable()
      stream.addData(Seq(Event(4, ts("2024-01-01 17:00:00"), 1, "click", 1.0)))
      q.processAllAvailable() // advance watermark so 09:00 window emits
      val nineOClock = spark.table("late_test")
        .filter(col("w_start") === ts("2024-01-01 09:00:00"))
        .as[(Timestamp, String, Long, Double)].collect()
      assert(nineOClock.length === 1)
      // late event 3 dropped: count 1, sum 1.0 (not 2 / 100.0)
      assert(nineOClock.head._3 === 1L)
      assert(math.abs(nineOClock.head._4 - 1.0) < 1e-9)
    } finally q.stop()
  }

  test("file-source stream over events.parquet matches the batch twin") {
    val q = EventStream.startToMemory(spark, SparkSpec.sfTiny, "file_stream_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_test")
      // append mode emits only watermark-finalized windows; every
      // emitted row must match the batch twin exactly
      val batch = graft.operators.Relational.eventsWindow(spark, SparkSpec.sfTiny)
        .withColumnRenamed("n_events", "n_b").withColumnRenamed("sum_value", "s_b")
      val joined = streamed.join(batch, Seq("w_start", "event_type"))
      assert(streamed.count() > 0, "stream emitted nothing")
      assert(joined.count() === streamed.count(), "streamed row missing from batch result")
      assert(joined.filter(col("n_events") =!= col("n_b")).count() === 0)
    } finally q.stop()
  }

  test("streaming session_window matches the batch plan and merges across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.sessionizedStream(stream.toDF())
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      // batch2's 11:30 event opens user 1's second session; 10:05+10:20
      // stay merged in the first (15-min gap < 30)
      stream.addData(batch2)
      q.processAllAvailable()
      val streamed = spark.table("session_test")
        .orderBy("user_id", "s_start")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
      val batch = EventStream.sessionizedStream((batch1 ++ batch2).toDF())
        .orderBy("user_id", "s_start")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
      assert(streamed === batch)
      // user 1: one merged 2-event session, then the 11:30 singleton
      val u1 = streamed.filter(_._1 == 1L)
      assert(u1.map(_._4) === Seq(2L, 1L), s"user 1 sessions: $u1")
      assert(streamed.map(_._4).sum === 6L, "every event lands in exactly one session")
    } finally q.stop()
  }

  test("runningUserTotals folds state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.runningUserTotals(stream.toDS())
      .writeStream.format("memory").queryName("state_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
      // Update mode: last emitted row per user is the running total.
      val latest = spark.table("state_test")
        .as[EventStream.SessionSummary].collect()
        .groupBy(_.user_id).view.mapValues(_.last).toMap
      assert(latest(1L).n_events === 3 && math.abs(latest(1L).total_value - 8.0) < 1e-9)
      assert(latest(2L).n_events === 2 && math.abs(latest(2L).total_value - 7.0) < 1e-9)
      assert(latest(3L).n_events === 1)
    } finally q.stop()
  }

  test("attributeClicks pairs clicks with same-user views within the window") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.attributeClicks(stream.toDF())
      .writeStream.format("memory").queryName("attr_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
        Event(2, ts("2024-01-01 10:05:00"), 1, "click", 1.0), // within 10 min of view 1
        Event(3, ts("2024-01-01 10:30:00"), 1, "click", 2.0), // > 10 min after the view
        Event(4, ts("2024-01-01 10:02:00"), 2, "click", 3.0), // other user, no view
        Event(5, ts("2024-01-01 11:59:00"), 3, "view", 0.0),
        Event(6, ts("2024-01-01 12:01:00"), 3, "click", 4.0))) // within window
      stream.addData(Seq( // advance the watermark well past the data
        Event(7, ts("2024-01-01 15:00:00"), 9, "view", 0.0)))
      q.processAllAvailable()
      val attributed = spark.table("attr_test")
        .select("user_id", "value").as[(Long, Double)].collect().toSet
      assert(attributed === Set((1L, 1.0), (3L, 4.0)), s"got $attributed")
    } finally q.stop()
  }

  test("stream-stream attribution equals the oracle-checked batch twin on the real events table") {
    val stream = EventStream.readEvents(spark, SparkSpec.sfTiny)
    val q = EventStream.attributeClicks(stream, window = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("attr_real")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_real")
        .select(col("user_id"), col("click_ts"), col("view_ts"),
          org.apache.spark.sql.functions.round(col("value"), 4).as("value"))
        .as[(Long, Timestamp, Timestamp, Double)].collect().toSet
      val batch = graft.operators.Relational.eventsAttribution(spark, SparkSpec.sfTiny)
        .as[(Long, Timestamp, Timestamp, Double)].collect().toSet
      assert(batch.nonEmpty, "fixture must produce at least one attributed pair")
      assert(streamed === batch,
        "inner stream-stream interval join must emit exactly the batch join's pairs")
    } finally q.stop()
  }

  test("left-outer attribution emits unattributed clicks with null view_ts after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.attributeClicks(stream.toDF(), joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_outer_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
        Event(2, ts("2024-01-01 10:05:00"), 1, "click", 1.0), // matched
        Event(3, ts("2024-01-01 10:30:00"), 2, "click", 2.0))) // no view: unattributed
      q.processAllAvailable()
      // matched row emits eagerly; the null-completion row must NOT
      // exist yet — a view for user 2 could still arrive
      val eager = spark.table("attr_outer_test")
        .select("user_id", "value").as[(Long, Double)].collect().toSet
      assert(eager === Set((1L, 1.0)), s"got $eager")
      // watermark far past 10:30 + window → the engine can prove no
      // match is coming and completes the outer row. BOTH sides need
      // late events: the query's global watermark is the MIN across
      // the view-side and click-side watermark nodes, so advancing
      // only the views would pin the click watermark at the stale
      // 10:30 click and its state would never evict.
      stream.addData(Seq(
        Event(4, ts("2024-01-01 15:00:00"), 9, "view", 0.0),
        Event(5, ts("2024-01-01 15:00:30"), 9, "click", 0.5)))
      q.processAllAvailable()
      stream.addData(Seq(
        Event(6, ts("2024-01-01 15:01:00"), 9, "view", 0.0),
        Event(7, ts("2024-01-01 15:01:30"), 9, "click", 0.7)))
      q.processAllAvailable()
      val rows = spark.table("attr_outer_test")
        .select(col("user_id"), col("value"), col("view_ts").isNull.as("unattributed"))
        .as[(Long, Double, Boolean)].collect().toSet
      assert(rows.contains((2L, 2.0, true)),
        s"unattributed click must complete with null view_ts, got $rows")
      assert(rows.contains((1L, 1.0, false)))
    } finally q.stop()
  }

  test("streaming decayed scores equal the batch EWMA on the real events table, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.load(spark, SparkSpec.sfTiny, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(_.ts.getTime)
    val (first, second) = all.splitAt(all.length / 2)
    val stream = MemoryStream[Event]
    val q = EventStream.decayedScores(stream.toDS())
      .writeStream.format("memory").queryName("decay_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(first.toSeq); q.processAllAvailable()
      stream.addData(second.toSeq); q.processAllAvailable()
      val streamed = spark.table("decay_test")
        .as[EventStream.DecayScore].collect()
        .map(d => d.event_id -> d.decayed).toMap
      val batch = graft.operators.Relational.eventsEwma(spark, SparkSpec.sfTiny)
        .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
      assert(streamed.size === batch.size)
      val diverged = batch.collect {
        case (id, b) if math.abs(streamed(id) - b) > 1e-3 => id
      }
      // ms-vs-us timestamp precision keeps scores within rounding; the
      // cross-batch split lands mid-horizon, so batch-2 scores exercise
      // the carried state, not a fresh buffer
      assert(diverged.isEmpty,
        s"${diverged.size} events diverge, e.g. ${diverged.take(3)}")
    } finally q.stop()
  }

  test("streaming decayed scores include all same-timestamp peers (batch RANGE-frame ties)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.decayedScores(stream.toDS())
      .writeStream.format("memory").queryName("decay_tie_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // two events at the SAME (user, ts): the batch twin's RANGE frame
      // scores BOTH with the pair's sum — the streaming buffer must
      // insert the tie group before scoring either, or the earlier
      // event_id misses its peer
      stream.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:00:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 10:30:00"), 1, "click", 3.0)))
      q.processAllAvailable()
      val scores = spark.table("decay_tie_test")
        .as[EventStream.DecayScore].collect()
        .map(d => d.event_id -> d.decayed).toMap
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val w = math.exp(-1800000.0 / 86400000.0) // 30 min at tau = 1 day
      assert(scores(1L) === r4(3.0), "earlier tie must see the later same-ts peer")
      assert(scores(2L) === r4(3.0))
      assert(scores(3L) === r4(3.0 * w + 3.0))
    } finally q.stop()
  }

  test("sessionCloseAlerts emits exactly one summary per session, only after the gap timeout") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.sessionCloseAlerts(stream.toDS())
      .writeStream.format("memory").queryName("close_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: two events 10 min apart — one session, still live
      stream.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0)))
      q.processAllAvailable()
      assert(spark.table("close_test").count() === 0,
        "live session must emit nothing")
      // advance the watermark (2h lateness) far past 10:40 = last_ts+gap:
      // 13:00 - 2h = 11:00 watermark > 10:40 timeout → session closes
      stream.addData(Seq(Event(3, ts("2024-01-01 13:00:00"), 2, "view", 9.0)))
      q.processAllAvailable()
      // timeout fires on the NEXT batch after the watermark moves
      stream.addData(Seq(Event(4, ts("2024-01-01 13:01:00"), 2, "view", 1.0)))
      q.processAllAvailable()
      val closed = spark.table("close_test")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSeq
      assert(closed === Seq((1L, 2L, 3.0)), s"got $closed")
    } finally q.stop()
  }

  test("sessionCloseAlerts splits on the gap WITHIN a batch (backfill determinism)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.sessionCloseAlerts(stream.toDS())
      .writeStream.format("memory").queryName("close_batch_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // one batch replays a user's full history: two sessions separated
      // by 3 hours — the first must close on the DATA path, not wait
      // for (or worse, merge past) the event-time timeout
      stream.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
        Event(3, ts("2024-01-01 13:00:00"), 1, "view", 5.0)))
      q.processAllAvailable()
      val closed = spark.table("close_batch_test")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSeq
      assert(closed === Seq((1L, 2L, 3.0)),
        s"first session must close mid-batch, second stay open: $closed")
    } finally q.stop()
  }

  test("sessionCloseAlerts closes a cross-batch out-of-order orphan as its own session") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.sessionCloseAlerts(stream.toDS())
      .writeStream.format("memory").queryName("orphan_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0)))
      q.processAllAvailable()
      // within the watermark (08:10) but 90 min BEFORE the open
      // session's start: absorbing it would stretch the session across
      // a gap the backfill never bridges — it must close on the spot as
      // its own single-event session
      stream.addData(Seq(Event(3, ts("2024-01-01 08:30:00"), 1, "view", 7.0)))
      q.processAllAvailable()
      val closed = spark.table("orphan_test")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSeq
      assert(closed === Seq((1L, 1L, 7.0)),
        s"orphan must close as its own session, not merge: $closed")
      // the carried 10:00–10:10 session is untouched: it still closes
      // with exactly its own two events once the watermark passes
      stream.addData(Seq(Event(4, ts("2024-01-01 14:00:00"), 2, "view", 0.0)))
      q.processAllAvailable()
      stream.addData(Seq(Event(5, ts("2024-01-01 14:01:00"), 2, "view", 0.0)))
      q.processAllAvailable()
      val all = spark.table("orphan_test")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(all.contains((1L, 2L, 3.0)), s"carried session must close intact: $all")
    } finally q.stop()
  }

  test("windowed aggregation state survives a checkpoint stop/restart") {
    implicit val sqlCtx = spark.sqlContext
    // kill-and-resume is the operational contract of a 100-TB stream:
    // the window state must come back from the checkpoint, not from
    // re-reading history the source may no longer hold.
    val ckpt = new java.io.File("target/streaming-spec/ckpt_recovery")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(ckpt)
    val stream = MemoryStream[Event]
    def start(name: String) = EventStream.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt.getPath)
      .start()
    val q1 = start("rec_v1")
    try {
      stream.addData(batch1)
      q1.processAllAvailable()
    } finally q1.stop()
    stream.addData(batch2) // arrives while the query is down
    val q2 = start("rec_v2")
    try {
      q2.processAllAvailable()
      val recovered = spark.table("rec_v2")
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventStream.windowedCounts((batch1 ++ batch2).toDF())
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(recovered === batch,
        "restarted query must fold checkpointed state with post-outage data")
      assert(recovered.map(_._3).sum === 6L, "no event lost or double-counted")
    } finally q2.stop()
  }

  test("dedupStream drops within-watermark duplicate ids, keeps the rest") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.dedupStream(stream.toDF(), keys = Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      // re-deliver event 2 (at-least-once upstream) plus a fresh event
      stream.addData(Seq(
        Event(2, ts("2024-01-01 10:20:00"), 1, "click", 2.0), // duplicate id
        Event(7, ts("2024-01-01 11:45:00"), 4, "view", 9.0)))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L, 4L, 7L), s"got $ids")
    } finally q.stop()
  }
}
