package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch window operators in
  * [[graft.ext.Windows]]: tumbling/sliding event-time aggregation with
  * watermarks, built-in session windows, and a custom
  * flatMapGroupsWithState sessionizer for state logic the built-ins
  * can't express.
  *
  * Batch/stream parity is the design invariant: the same aggregation
  * expressions run in both modes, and the specs assert the streaming
  * output equals the batch result on the same input.
  */
object StreamOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Tumbling event-time aggregation with a watermark. Sums use the
    * same order-proof micro-quantization as the batch twin
    * (graft.ext.Windows.stableSum). */
  def tumblingCounts(events: DataFrame, width: String,
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.ext.Windows.stableSum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding event-time aggregation. */
  def slidingCounts(events: DataFrame, width: String, slide: String,
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** Built-in session windows (gap-based). */
  def sessionCounts(events: DataFrame, gap: String,
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** One emitted session. Bounds are MICROSECONDS since the epoch —
    * the staged source's native precision, so the oracle can replay
    * gap decisions exactly (µs-truncated on both engines). */
  case class SessionAgg(user_id: Long, n_events: Long, start_us: Long,
                        end_us: Long)
  /** Per-user sessionizer state (public: the state Encoder's generated
    * code must be able to reach the constructor). Times in µs. */
  case class SessionState(n: Long, start: Long, last: Long)

  /** Full-precision event time: java.sql.Timestamp.getTime truncates
    * to ms; the staged parquet carries µs. A gap decided at ms while
    * the oracle decides at µs would diverge on a boundary row. */
  private def eventMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Custom sessionizer via flatMapGroupsWithState — the escape hatch
    * for per-key state machines beyond session_window's semantics.
    *
    * EVENT-TIME timeouts: a user's open session is emitted when the
    * WATERMARK passes `last + gap` — the earliest moment the session
    * is provably closed, because any event that could still extend it
    * (ts within gap of `last`) would by then be later than the
    * watermark and dropped as late data. Processing-time timeouts
    * (the round-4 design) made emission depend on wall-clock
    * scheduling, which is non-deterministic and never fires on a
    * bounded source drained in one micro-batch; event-time timeouts
    * make the operator deterministic AND registrable: once the
    * watermark advances past every session's close, a no-data
    * micro-batch flushes them all.
    *
    * The watermark delay is FIXED at 0 seconds — deliberately not a
    * parameter. Sessions closed by a gap-break INSIDE a batch emit
    * immediately, which is only final if no out-of-order event can
    * still arrive under the watermark and extend them; at delay 0
    * every such event is late data and is dropped before the
    * operator, so immediate emission is exact. A nonzero delay would
    * need closed-session buffering in state to stay correct — a
    * different operator, not a knob on this one.
    *
    * State per user is one (n, start, last) triple — bounded by the
    * live keyspace, evicted at emission; the 100 TB-stream shape. */
  def statefulSessions(events: Dataset[Event], gapMs: Long)
      : Dataset[SessionAgg] = {
    val gapUs = gapMs * 1000L
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionAgg(user, s.n, s.start, s.last))
          } else {
            val evs = it.toSeq.sortBy(e => eventMicros(e.ts))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer[SessionAgg]()
            evs.foreach { e =>
              val t = eventMicros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(SessionState(s.n + 1, s.start, t))
                case Some(s) =>
                  out += SessionAgg(user, s.n, s.start, s.last)
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close at watermark >= last+gap (timer API is ms);
              // clamp above the current watermark (Spark rejects a
              // timeout at-or-before it, which can happen when a
              // key's whole batch arrived just ahead of the
              // advancing watermark)
              state.setTimeoutTimestamp(
                math.max((s.last + gapUs) / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Streaming exact dedup on a key subset: keeps the FIRST arrival
    * per key. Only the key columns are emitted — arrival order across
    * partitions is not deterministic, so first-arrival PAYLOADS are
    * not replayable, but the emitted KEY SET equals batch
    * `SELECT DISTINCT keys` for every key whose rows arrive within the
    * watermark discipline: rows later than the advanced watermark are
    * dropped as late data BEFORE the dedup operator, like any
    * watermarked stateful op. (On a bounded source processed in one
    * micro-batch — the registered stream_dedup run — the watermark
    * never drops anything and the equality is exact.) At 100 TB this
    * is the ingest-side guard that keeps re-delivered records from
    * reaching the corpus; with `withinWatermark` the per-key state is
    * also EVICTED at the horizon, trading re-admission of long-gone
    * keys for bounded state. */
  def streamingDedup(events: DataFrame, keys: Seq[String],
                     watermark: String = "1 hour",
                     withinWatermark: Boolean = false): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    // withinWatermark bounds state (keys evict once older than the
    // horizon) at the cost of re-admitting a key that reappears after
    // the horizon — the right trade for unbounded streams; the exact
    // global variant keeps all keys in state and equals batch DISTINCT
    val deduped =
      if (withinWatermark) wm.dropDuplicatesWithinWatermark(keys)
      else wm.dropDuplicates(keys)
    deduped.select(keys.map(col): _*)
  }

  /** Stream-stream INTERVAL JOIN: left events matched to right events
    * of the same key within [left.ts, left.ts + window]. Both sides are
    * watermarked, and the time-bounded condition is what makes the
    * join's state finite: a buffered left row can only ever match right
    * rows inside its interval, so once the right watermark passes
    * left.ts + window the row is evicted — the mechanism that lets two
    * unbounded 100 TB/day streams join with bounded executor state
    * (an unconstrained stream-stream join would buffer both streams
    * forever). Inner join: matches emit in the micro-batch they form.
    *
    * Columns are renamed per side before the join so the condition is
    * unambiguous: left keeps `key`/`ts` as `key`/`l_ts`, right becomes
    * `r_key`/`r_ts`. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   window: String, watermark: String = "1 hour"): DataFrame = {
    val l = left.select(col(key), col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("r_key"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r, expr(
      s"$key = r_key AND r_ts >= l_ts AND r_ts <= l_ts + interval $window"))
      .select(col(key), col("l_ts"), col("r_ts"))
  }

  /** Run a streaming query over a bounded source to completion into an
    * in-memory table, returning the result — used by specs to assert
    * batch/stream parity. */
  def runToMemory(stream: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val spark = stream.sparkSession
    val q = stream.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
