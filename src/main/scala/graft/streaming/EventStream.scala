package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming tier over the events table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is strictly batch (SURVEY.md §2.6); this is the
  * beyond-parity streaming surface. [[graft.operators.Relational.eventsWindow]]
  * is the batch twin of [[windowedCounts]] — same plan shape, so a
  * backfill and the live stream produce identical aggregates.
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionSummary(user_id: Long, n_events: Long, total_value: Double)

  /** Hourly per-type counts/sums with a watermark — late events beyond
    * the watermark are dropped, which bounds state size on an unbounded
    * stream (the thing a batch engine never has to think about).
    * `slide` < window length turns it HOPPING (the streaming twin of
    * `events_window_sliding`): each event feeds len/slide windows and
    * state is per OPEN window × group, still watermark-bounded. */
  def windowedCounts(events: DataFrame, watermark: String = "2 hours",
                     slide: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Per-user running totals via explicit state — the
    * `mapGroupsWithState` shape used for custom sessionization logic
    * that windowed aggregation can't express. State is per-key and
    * partitioned by user_id, so it scales horizontally with users. */
  def runningUserTotals(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionSummary]) =>
          val prev = state.getOption.getOrElse(SessionSummary(user, 0L, 0.0))
          val next = batch.foldLeft(prev) { (acc, e) =>
            SessionSummary(user, acc.n_events + 1, acc.total_value + e.value)
          }
          state.update(next)
          next
      }
  }

  case class ClosedSession(user_id: Long, n_events: Long,
                           total_value: Double, last_ts: Timestamp)

  /** [[sessionCloseAlerts]] state: the one open session per user.
    * Carries `first_ts` as well as `last_ts` so a cross-batch
    * OUT-OF-ORDER event that predates the session's start by more than
    * the gap is recognized as foreign — comparing only against
    * `last_ts` would silently absorb it (the delta is negative, never
    * `> gap`), making live-stream session boundaries diverge from the
    * single-batch backfill. */
  case class OpenSession(user_id: Long, n_events: Long, total_value: Double,
                         first_ts: Timestamp, last_ts: Timestamp)

  /** Session-CLOSE alerts via `flatMapGroupsWithState` + event-time
    * timeout — the stateful shape [[sessionizedStream]] can't express:
    * emit NOTHING while a session is live, exactly one summary row per
    * session once it closes. A session closes two ways, and BOTH must
    * enforce the gap or boundaries become batch-slicing-dependent:
    *  - timeout path: the watermark passes last_ts + gap with no new
    *    data for the key — Spark invokes the function with
    *    `hasTimedOut` and no rows;
    *  - data path: a later event for the key arrives already more
    *    than `gap` past the carried session's last event (possible
    *    within one batch, or whenever a batch reaches the key before
    *    its timeout fires) — the carried session is emitted closed
    *    and a new one opens. A single-batch backfill of full history
    *    therefore fires the same closes as the live stream.
    * A third, cross-batch-only case: a within-watermark OUT-OF-ORDER
    * event arriving more than `gap` BEFORE the open session's first
    * event cannot belong to it — it closes immediately as its own
    * single-event session (its event-time neighborhood was already
    * folded in earlier batches), instead of being absorbed. Within
    * `gap` before the start it extends the session backward, exactly
    * as the backfill would merge it.
    * The timeout is event-time, so reprocessing history is
    * deterministic; state carries one open session per user. */
  def sessionCloseAlerts(events: Dataset[Event], gapMinutes: Long = 30,
                         watermark: String = "2 hours"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMillis = gapMinutes * 60000L
    def close(o: OpenSession) =
      ClosedSession(o.user_id, o.n_events, o.total_value, o.last_ts)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val closed = close(state.get)
            state.remove()
            Iterator(closed)
          } else {
            // fold the batch in event-time order, closing on every gap
            val rows = batch.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption.orNull
            val closed = Seq.newBuilder[ClosedSession]
            rows.foreach { e =>
              val t = e.ts.getTime
              if (open == null)
                open = OpenSession(user, 1L, e.value, e.ts, e.ts)
              else if (t - open.last_ts.getTime > gapMillis) {
                closed += close(open)
                open = OpenSession(user, 1L, e.value, e.ts, e.ts)
              } else if (open.first_ts.getTime - t > gapMillis)
                // out-of-order orphan: predates the session start by
                // more than the gap — its own session, closed on the spot
                closed += ClosedSession(user, 1L, e.value, e.ts)
              else
                open = OpenSession(user, open.n_events + 1,
                  open.total_value + e.value,
                  if (e.ts.before(open.first_ts)) e.ts else open.first_ts,
                  if (e.ts.after(open.last_ts)) e.ts else open.last_ts)
            }
            state.update(open)
            state.setTimeoutTimestamp(open.last_ts.getTime + gapMillis)
            closed.result().iterator // only sessions CLOSED by a gap emit
          }
      }
  }

  /** Gap-based streaming sessionization via the native
    * `session_window`: a user's session stays open while events keep
    * arriving within `gap` of the last one and closes (gets emitted,
    * state dropped) once the watermark passes the gap — the streaming
    * twin of [[graft.operators.Relational.eventsSessionize]]'s
    * lag+cumsum formulation. Sessions merge across micro-batches: an
    * event landing inside an open session's window extends it, which
    * is exactly the semantics the batch twin computes in one pass. */
  def sessionizedStream(events: DataFrame, gap: String = "30 minutes",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("s_start"),
        col("sw.end").as("s_end"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup — the ingest-time guard an LLM-data
    * pipeline puts in front of a corpus lake (at-least-once upstream
    * delivery means duplicate events/documents WILL arrive). Keyed by
    * an explicit id column; `dropDuplicatesWithinWatermark` keeps a
    * key's state only until the watermark passes it, so state is
    * bounded by the lateness window rather than the stream's lifetime
    * — the property that makes exact streaming dedup feasible on an
    * unbounded 100-TB ingest. */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  case class DecayScore(event_id: Long, user_id: Long, decayed: Double)

  /** [[decayedScores]] state: the user's events inside the decay
    * horizon, (epoch-ms, value) pairs. Bounded by events-per-horizon,
    * not stream lifetime — the property that makes per-event decay
    * scoring feasible on an unbounded stream. */
  case class DecayBuffer(events: List[(Long, Double)])

  /** STREAMING TWIN of [[graft.operators.Relational.eventsEwma]]: at
    * each event, the user's Σ value·e^(-Δt/τ) over the trailing
    * `horizonDays`. The batch form is a closed-form window; streaming
    * needs real state because the score is per-EVENT, not per-window:
    * a per-user buffer of in-horizon events, pruned against the
    * newest timestamp seen, scored by direct summation (|buffer| is
    * events-per-horizon — ~16 here — so O(|buffer|) per event beats
    * maintaining an incremental sum that a late event would force to
    * rescale anyway). Within a micro-batch events are processed in
    * event-time order; a cross-batch late event inside the horizon is
    * inserted and scored exactly (the buffer still holds its
    * neighborhood); one older than the horizon scores from what
    * remains — the same degrade-not-diverge posture as
    * [[sessionCloseAlerts]]'s orphan handling. */
  def decayedScores(events: Dataset[Event], tauDays: Double = 1.0,
                    horizonDays: Int = 7): Dataset[DecayScore] = {
    import events.sparkSession.implicits._
    val horizonMs = horizonDays * 86400000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[DecayBuffer]) =>
          var buf = state.getOption.map(_.events).getOrElse(Nil)
          // Same-timestamp events insert as a GROUP before any of them
          // scores: the batch twin's RANGE frame includes every same-ts
          // peer in every peer's score, so scoring one tie before
          // inserting the other would diverge from it. (Ties split
          // across micro-batches still diverge — append mode can't
          // rescore an emitted row; the twin contract covers ties that
          // arrive together, which event-time-ordered replay does.)
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val tsGroups = sorted.foldRight(List.empty[List[Event]]) {
            case (e, h :: t) if h.head.ts.getTime == e.ts.getTime => (e :: h) :: t
            case (e, acc) => List(e) :: acc
          }
          val out = tsGroups.flatMap { g =>
            val t = g.head.ts.getTime
            g.foreach(e => buf = (t, e.value) :: buf)
            val tMax = buf.iterator.map(_._1).max
            buf = buf.filter(_._1 >= tMax - horizonMs)
            g.map { e =>
              val score = buf.iterator
                .filter { case (ti, _) => ti <= t && ti >= t - horizonMs }
                .map { case (ti, v) => v * math.exp((ti - t) / 86400000.0 / tauDays) }
                .sum
              DecayScore(e.event_id, user,
                BigDecimal(score).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          }
          state.update(DecayBuffer(buf))
          out.iterator
      }
  }

  /** Stream-stream attribution join: each click joins the views by
    * the same user in the preceding `window` — the canonical
    * event-correlation shape (ad attribution, cause→effect pairing).
    * Both sides carry watermarks and the join condition bounds the
    * time range, so Spark can expire join state as the watermark
    * advances — without the range bound, stream-stream join state
    * grows forever. Shuffles on user_id; state is per-key. */
  /** `joinType = "left_outer"` turns this into the UNATTRIBUTED-click
    * detector: a click with no in-window view emits once — with a null
    * view_ts — after the watermark passes its join window (the engine
    * can only then prove no matching view is still coming). Inner
    * emits eagerly on match; outer adds the watermark-gated
    * null-completion, which is the semantics monitoring actually
    * needs ("how many clicks have no preceding view?"). */
  def attributeClicks(events: DataFrame, window: String = "10 minutes",
                      watermark: String = "1 hour",
                      joinType: String = "inner"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("value"))
      .withWatermark("click_ts", watermark)
    clicks.join(views,
      col("user_id") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $window"),
      joinType)
      .select("user_id", "click_ts", "view_ts", "value")
  }

  /** Streaming read of an events parquet directory (new files are
    * picked up incrementally — the standard lake-ingest pattern).
    * The stream must use the RAW file schema (int64-nanos files arrive
    * as LongType via the legacy nanosAsLong read; timestamp[us] files
    * as TIMESTAMP_NTZ) and then apply the same schema-adaptive `ts`
    * normalization as the batch path ([[graft.Tables.normalizeTs]]) —
    * feeding a converted schema to the file source would misinterpret
    * the raw values, and a hard-coded conversion breaks the moment the
    * environment swaps the physical type (it did, round 6). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // nanosAsLong is session-construction state (GraftSession.builder)
    // — mutating session conf at read time races concurrent queries
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file source wants a directory; glob the single table file
    // with an explicit basePath so a real lake layout (directory of
    // part files) works identically
    graft.Tables.normalizeTs(
      spark.readStream.schema(rawSchema)
        .option("basePath", dir)
        .parquet(s"$dir/events.[p]arquet"))
  }

  /** Convenience: run [[windowedCounts]] on [[readEvents]] into an
    * in-memory sink (used by the spec; production would writeStream to
    * a table/sink with a checkpoint dir). */
  def startToMemory(spark: SparkSession, dir: String, queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedCounts(readEvents(spark, dir))
      .writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Append())
      .start()
}
