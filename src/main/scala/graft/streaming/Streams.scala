package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props — TESTDATA.md).
  *
  * The reference is a batch federation engine; streams are the
  * beyond-reference surface the builder prompt mandates, expressed in
  * Spark's native streaming model: `readStream` → these transforms →
  * `writeStream`, with event-time watermarks bounding state.
  *
  * Scale design: all operators below are keyed by event_type/user_id/
  * event_id, so state is hash-partitioned across executors; watermarks
  * evict window and dedup state, keeping the state store O(active keys in
  * the watermark horizon) rather than O(stream history) — the property
  * that decides whether a streaming job survives week-long uptimes.
  */
object Streams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(
      user_id: Long, n_events: Long, total_value: Double,
      first_ts: Timestamp, last_ts: Timestamp, closed: Boolean)

  final case class AnomalyFlag(
      event_id: Long, user_id: Long, cents: Long, n: Long, is_anomaly: Boolean)

  final case class AnomalyState(recent: Array[Long])

  /** Streaming rolling 3-sigma anomaly detection: each event compares its
    * value (integer cents) against the mean/variance of that user's
    * previous ten events, carried across micro-batches as keyed state —
    * the live twin of the batch `q_events_anomaly` window. The test
    * cross-multiplies (n·x − s)² > 9·(n·ss − s²) so no division ever
    * happens; fewer than five priors abstains.
    *
    * Ordering contract: within a micro-batch the group's events sort by
    * (ts, event_id); across batches the caller must feed time-ordered
    * slabs (the gate stages ascending time-range files and admits one per
    * trigger). That is the production shape — a kafka source partitioned
    * by user key is per-key ordered already.
    *
    * Scale: state per user is a bounded 10-value buffer (a few hundred
    * bytes), hash-partitioned by user_id across executors — O(active
    * users), not O(history); no timeout needed because the buffer cannot
    * grow. */
  def rollingAnomaly(events: Dataset[Event]): Dataset[AnomalyFlag] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomalyState, AnomalyFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[AnomalyState]) =>
          // full-precision event-time order: Timestamp.getTime truncates
          // to millis, and two same-millisecond events with microsecond
          // parts ordered opposite to event_id would replay swapped vs
          // the batch window's (ts, event_id) sort
          val evs = it.toSeq.sortWith { (a, b) =>
            val c = a.ts.compareTo(b.ts)
            c < 0 || (c == 0 && a.event_id < b.event_id)
          }
          var buf = state.getOption.map(_.recent).getOrElse(Array.empty[Long])
          val out = evs.map { e =>
            // positive-domain rounding: identical to SQL round() here
            // (fixture values are positive; HALF_UP == math.round there)
            val x = math.round(e.value * 100)
            val n = buf.length.toLong
            val s = buf.sum
            val ss = buf.iterator.map(v => v * v).sum
            val d = n * x - s
            val flag = n >= 5 && d * d > 9 * (n * ss - s * s)
            buf = (buf :+ x).takeRight(10)
            AnomalyFlag(e.event_id, userId, x, n, flag)
          }
          state.update(AnomalyState(buf))
          out.iterator
      }
  }

  /** Event-time tumbling-window counts per event type with a watermark:
    * late events beyond the delay are dropped and window state is evicted
    * once the watermark passes the window end. */
  def windowedCounts(
      events: DataFrame, windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      // decimal sum: exact order-insensitive addition, so micro-batch
      // arrival order can never flip the rounding vs a batch oracle
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 4)
          .cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding (hopping) windows: each event lands in size/hop overlapping
    * windows; state per (window, event_type) is evicted once the watermark
    * passes the window end, exactly as for tumbling windows. */
  def slidingCounts(
      events: DataFrame, size: String, hop: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), size, hop), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 4)
          .cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Stream-static enrichment join: the static dimension is planned as a
    * broadcast into every micro-batch — stateless (no join state store),
    * the same dimension-broadcast shape the batch queries use. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, joinExpr: Column): DataFrame =
    events.join(broadcast(dim), joinExpr)

  /** Exact streaming dedup on event_id: first occurrence wins, replays
    * are dropped. NOTE: with the watermark column absent from the dedup
    * keys, dropDuplicates state is NEVER evicted — fine for a bounded key
    * domain (a replay horizon of ids), wrong for an infinite stream; use
    * [[dedupEventsBounded]] there. */
  def dedupEvents(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("event_id")

  /** Watermark-BOUNDED streaming dedup (`dropDuplicatesWithinWatermark`):
    * key state is evicted once the watermark passes its event time, so an
    * infinite key domain runs at O(events inside the horizon) state — the
    * production shape for at-least-once sources (kafka retries land
    * within seconds of the original). Records whose event times fall
    * within the delay of each other are guaranteed deduplicated; replays
    * carrying the ORIGINAL event's timestamp (retries do) dedup at any
    * delay, which is what makes the gate batch-reproducible. */
  def dedupEventsBounded(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based session windows per user: consecutive events closer than
    * `gap` merge into one session (native `session_window` state merge;
    * watermark closes and evicts sessions whose end falls behind it). */
  def sessionWindows(events: DataFrame, gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 4)
          .cast("double").as("total_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("total_value"))

  /** Stream-stream interval join (append-only): trigger events of one
    * type joined to the same user's follow-up events inside an event-time
    * interval. Watermarks on BOTH sides let Spark bound the join state —
    * a buffered row is evicted once the other side's watermark passes the
    * end of the interval it could still match, the property that keeps a
    * stream-stream join alive at week-long uptimes (unbounded two-sided
    * buffering is the classic streaming-join OOM). Inner joins emit each
    * match as soon as both rows have arrived, so the drained result
    * converges to the batch join regardless of the final watermark. */
  def followWithin(
      triggers: DataFrame, follows: DataFrame, triggerType: String,
      interval: String, watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    val a = triggers.filter(col("event_type") === triggerType)
      .select(col("event_id").as("trigger_id"), col("ts").as("trigger_ts"),
        col("user_id").as("t_user"))
      .withWatermark("trigger_ts", watermarkDelay)
    val b = follows
      .select(col("event_id").as("follow_id"), col("ts").as("follow_ts"),
        col("user_id").as("f_user"), col("event_type").as("follow_type"),
        col("value"))
      .withWatermark("follow_ts", watermarkDelay)
    // leftOuter adds the eviction-emit path: a trigger whose interval
    // falls fully behind the watermark with no match emits ONCE with
    // null follow columns — the state cleanup inner joins never surface.
    // The sweep runs one micro-batch behind the watermark, so DRAINING a
    // finite stream to completion requires the barrier pattern: post a
    // far-future sentinel that passes both sides' watermark operators and
    // run two more micro-batches (StreamQueries.drainWithFinalSweep) —
    // after which every unmatched trigger has emitted its null row.
    a.join(b, col("t_user") === col("f_user") &&
      col("follow_ts") > col("trigger_ts") &&
      col("follow_ts") <= col("trigger_ts") + expr(s"INTERVAL $interval"),
      joinType)
  }

  /** Custom keyed state: per-user running session summary via
    * flatMapGroupsWithState — the engine-level escape hatch for state
    * machines the built-in aggregations can't express. A session closes
    * (emits `closed = true`) after `gapMs` of event-time silence, enforced
    * with an event-time timeout so state is reclaimed. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionSummary]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(s.copy(closed = true))
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            if (evs.isEmpty) Iterator.empty
            else {
              val prev = state.getOption
              val first = prev.map(_.first_ts).getOrElse(evs.head.ts)
              val summary = SessionSummary(
                userId,
                prev.map(_.n_events).getOrElse(0L) + evs.size,
                prev.map(_.total_value).getOrElse(0.0) + evs.map(_.value).sum,
                first, evs.last.ts, closed = false)
              state.update(summary)
              state.setTimeoutTimestamp(evs.last.ts.getTime + gapMs)
              Iterator.single(summary)
            }
          }
      }
  }
}
