package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key session state via `flatMapGroupsWithState` — the escape
  * hatch for session semantics the built-in `session_window` cannot express
  * (emit-on-close with arbitrary per-session accumulators, length caps,
  * custom merge rules). State is the short sorted list of OPEN sessions per
  * key — more than one only while late data within the watermark horizon
  * can still arrive between them — and every session is dropped the moment
  * the watermark passes its close edge. Bounded by concurrently-active
  * keys, never by history, which is what keeps custom state viable at
  * 100 TB/day ingest.
  *
  * The merge rule matches `session_window` exactly, INCLUDING late events:
  * an event merges into any open session whose window `(start-gap,
  * last+gap)` covers it (extending `start` backwards when the event
  * precedes it), adjacent sessions coalesce when a bridging event arrives,
  * and an event at exactly `last + gap` starts a NEW session (the window
  * is half-open). Verified against the built-in and a first-principles
  * oracle (StatefulSessionsSpec, `st_sessions_custom`).
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

  /** Fold one event into the sorted open-session list: merge into the
    * session whose (start-gap, last+gap) window covers ts — extending the
    * start backwards for a late preceding event — else insert a new
    * session; then coalesce neighbours the event may have bridged. */
  private def fold(sessions: List[SessionState], ts: Long,
                   gapMicros: Long): List[SessionState] = {
    val idx = sessions.indexWhere(s =>
      ts > s.startMicros - gapMicros && ts < s.lastMicros + gapMicros)
    val merged =
      if (idx >= 0) {
        val s = sessions(idx)
        sessions.updated(idx, s.copy(
          startMicros = math.min(s.startMicros, ts),
          lastMicros = math.max(s.lastMicros, ts), n = s.n + 1))
      } else {
        (SessionState(ts, ts, 1) :: sessions).sortBy(_.startMicros)
      }
    // coalesce adjacent sessions the new/extended one now overlaps
    merged.foldRight(List.empty[SessionState]) {
      case (cur, next :: rest) if next.startMicros < cur.lastMicros + gapMicros =>
        SessionState(cur.startMicros, math.max(cur.lastMicros, next.lastMicros),
          cur.n + next.n) :: rest
      case (cur, acc) => cur :: acc
    }
  }

  /** Sessionize `events` (must carry `keyCol` and a timestamp `tsCol`;
    * null timestamps are dropped) with a `gapSeconds` inactivity close
    * rule. Emits one row per CLOSED session: `(key, session_start, n)`.
    * On a streaming frame, a session closes — and its state is dropped —
    * once the event-time watermark passes last + gap; on a batch frame
    * every session except each key's trailing open one closes at
    * end-of-input (use [[sessionizeBatchComplete]] to close those too). */
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
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"))
      .withWatermark("ts", watermark)
      .as[Event]

    typed.groupByKey(_.key)
      .flatMapGroupsWithState[List[SessionState], ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: String, it: Iterator[Event], state: GroupState[List[SessionState]]) => {
          def finish(open: List[SessionState],
                     closed: Seq[SessionState]): Iterator[ClosedSession] = {
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              if (streaming) {
                // next close edge; micros round UP to millis so the
                // timeout can never fire early, and it must stay strictly
                // ahead of the current watermark
                val nextMicros = open.map(_.lastMicros + gapMicros).min
                state.setTimeoutTimestamp(math.max(
                  Math.floorDiv(nextMicros + 999, 1000),
                  state.getCurrentWatermarkMs() + 1))
              }
            }
            closed.map(s =>
              ClosedSession(key, tsFromMicros(s.startMicros), s.n)).iterator
          }
          val sessions = state.getOption.getOrElse(Nil)
          if (state.hasTimedOut) {
            val wmMicros = state.getCurrentWatermarkMs() * 1000L
            val (done, open) = sessions.partition(_.lastMicros + gapMicros <= wmMicros)
            finish(open, done)
          } else {
            val sorted = it.map(e => microsOf(e.ts)).toArray.sorted
            val folded = sorted.foldLeft(sessions)((acc, ts) => fold(acc, ts, gapMicros))
            if (streaming) {
              // sessions already behind the watermark can never change
              // (later events arrive above the watermark, beyond their
              // close edge): emit eagerly instead of waiting for a
              // timeout batch
              val wmMicros = state.getCurrentWatermarkMs() * 1000L
              val (done, open) = folded.partition(_.lastMicros + gapMicros <= wmMicros)
              finish(open, done)
            } else {
              // batch: single group call sees all events — everything
              // except the trailing open session is definitively closed
              finish(folded.takeRight(1), folded.dropRight(1))
            }
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
    val nonNull = events.filter(col(tsCol).isNotNull)
    // the sentinel must sit BEYOND the gap of every trailing session or it
    // would merge into it — derive the offset from the gap itself
    val sentinel = nonNull.select(col(keyCol), col(tsCol))
      .groupBy(col(keyCol)).agg(max(col(tsCol)).as(tsCol))
      .withColumn(tsCol, col(tsCol) + expr(s"INTERVAL ${gapSeconds + 1} SECONDS"))
    val withSentinel = nonNull.select(col(keyCol), col(tsCol))
      .unionByName(sentinel)
    sessionize(withSentinel, keyCol, tsCol, gapSeconds).toDF()
  }
}
