package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key session state via `flatMapGroupsWithState` — the escape
  * hatch for session semantics the built-in `session_window` cannot express
  * (emit-on-close with arbitrary per-session accumulators, length caps,
  * custom merge rules). State is ONE small record per OPEN session key,
  * dropped the moment the session closes (event-time timeout) — bounded by
  * concurrently-active keys, never by history, which is what keeps custom
  * state viable at 100 TB/day ingest.
  *
  * The gap-based close rule intentionally matches `session_window`, so the
  * operator verifies against the built-in on identical input
  * (StatefulSessionsSpec); production variants extend [[SessionState]] and
  * the fold inside [[sessionize]].
  */
object StatefulSessions {

  final case class Event(key: String, ts: Timestamp)

  private def microsOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  /** Micros-exact Timestamp (the millis constructor would truncate the
    * sub-millisecond part that session_window keeps). */
  private def tsFromMicros(micros: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }
  final case class SessionState(startMicros: Long, lastMicros: Long, n: Long)
  final case class ClosedSession(key: String, session_start: Timestamp, n: Long)

  /** Sessionize `events` (must carry `keyCol` and a timestamp `tsCol`) with
    * a `gapSeconds` inactivity close rule. Emits one row per CLOSED
    * session: `(key, session_start, n)`. On a streaming frame, open
    * sessions close via event-time timeout once the watermark passes
    * last + gap; on a batch frame timeouts never fire (use
    * [[sessionizeBatchComplete]] for end-of-input closure). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long, watermark: String = "0 seconds"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L
    val streaming = events.isStreaming
    // the event-time (watermark) column must survive INTO the stateful
    // operator — EventTimeTimeout is rejected without it — so the typed
    // Dataset carries the raw timestamp and converts to micros per row
    val typed = events
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"))
      .withWatermark("ts", watermark)
      .as[Event]

    typed.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: String, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is closed
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(key, tsFromMicros(s.startMicros), s.n))
          } else {
            // events within one batch arrive unordered: sort, then fold
            // with session_window's close rule (gap measured from the last
            // event; the session covers [start, last + gap))
            val sorted = it.map(e => microsOf(e.ts)).toArray.sorted
            var open = state.getOption
            val closed = List.newBuilder[ClosedSession]
            sorted.foreach { ts =>
              open match {
                case Some(s) if ts < s.lastMicros + gapMicros =>
                  open = Some(s.copy(lastMicros = math.max(s.lastMicros, ts), n = s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(key, tsFromMicros(s.startMicros), s.n)
                  open = Some(SessionState(ts, ts, 1))
                case None =>
                  open = Some(SessionState(ts, ts, 1))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                if (streaming) {
                  // close once the watermark passes last + gap (must stay
                  // strictly ahead of the current watermark)
                  val timeoutMs = s.lastMicros / 1000 + gapSeconds * 1000
                  state.setTimeoutTimestamp(
                    math.max(timeoutMs, state.getCurrentWatermarkMs() + 1))
                }
              case None => state.remove()
            }
            closed.result().iterator
          }
        })
  }

  /** Batch-mode convenience: emit every session including each key's
    * trailing open one (a batch has no "later" data) by appending a
    * far-future sentinel event per key that force-closes whatever is open;
    * the sentinel's own 1-event session is never emitted (it stays open
    * when the pass ends). */
  def sessionizeBatchComplete(events: DataFrame, keyCol: String, tsCol: String,
                              gapSeconds: Long): DataFrame = {
    val sentinel = events.select(col(keyCol), col(tsCol))
      .groupBy(col(keyCol)).agg(max(col(tsCol)).as(tsCol))
      .withColumn(tsCol, col(tsCol) + expr("INTERVAL 3650 DAYS"))
    val withSentinel = events.select(col(keyCol), col(tsCol))
      .unionByName(sentinel)
    sessionize(withSentinel, keyCol, tsCol, gapSeconds).toDF()
  }
}
