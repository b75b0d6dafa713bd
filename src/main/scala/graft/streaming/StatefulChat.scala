package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING chat-transcript assembly — the streaming twin of
  * [[graft.operators.Corpus.chatAssembly]], for the live-ingestion shape
  * of SFT-data prep: events arrive out of order on a micro-batched
  * stream, sessions close when the event-time WATERMARK passes their
  * inactivity gap, and each closed session emits ONE row carrying its
  * fully-ordered transcript. Same custom-state machinery as
  * [[StatefulSessions]] (`flatMapGroupsWithState`, event-time timeout,
  * late-event merge incl. backwards start-extension and session
  * bridging), with the turns carried IN the per-session state.
  *
  * State per key = the open sessions' turn lists — bounded by session
  * ACTIVITY (watermark closure drops state), not stream length; an
  * unbounded-chat key is the same pathology as an unbounded session in
  * any engine and shows up as state-store growth, not wrong output.
  * Turns order by `(event time, tie)` at emission, so a same-timestamp
  * pair cannot make two runs emit different transcripts. */
object StatefulChat {

  final case class TurnEvent(key: String, ts: Timestamp, tie: Long, turn: String)
  final case class ChatSession(startMicros: Long, lastMicros: Long,
                               turns: List[(Long, Long, String)])
  final case class ClosedChat(key: String, session_start: Timestamp,
                              n_turns: Long, transcript: String)

  private def microsOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private def tsFromMicros(micros: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  /** [[StatefulSessions]]' fold with the turn riding along: merge into
    * the covering session (extending backwards for late events) or
    * insert, then coalesce neighbours the event may have bridged —
    * bridged sessions CONCATENATE their turn lists. */
  private def fold(sessions: List[ChatSession], ts: Long, tie: Long,
                   turn: String, gapMicros: Long): List[ChatSession] = {
    val idx = sessions.indexWhere(s =>
      ts > s.startMicros - gapMicros && ts < s.lastMicros + gapMicros)
    val merged =
      if (idx >= 0) {
        val s = sessions(idx)
        sessions.updated(idx, ChatSession(
          math.min(s.startMicros, ts), math.max(s.lastMicros, ts),
          (ts, tie, turn) :: s.turns))
      } else {
        (ChatSession(ts, ts, List((ts, tie, turn))) :: sessions)
          .sortBy(_.startMicros)
      }
    merged.foldRight(List.empty[ChatSession]) {
      case (cur, next :: rest) if next.startMicros < cur.lastMicros + gapMicros =>
        ChatSession(cur.startMicros,
          math.max(cur.lastMicros, next.lastMicros),
          cur.turns ++ next.turns) :: rest
      case (cur, acc) => cur :: acc
    }
  }

  private def render(key: String, s: ChatSession): ClosedChat = {
    val ordered = s.turns.sortBy(t => (t._1, t._2))
    ClosedChat(key, tsFromMicros(s.startMicros), ordered.size.toLong,
      ordered.map(_._3).mkString("\n"))
  }

  /** Assemble transcripts from `events` (streaming or batch frame).
    * Emits one row per CLOSED session; on a streaming frame a session
    * closes when the watermark passes `last + gap`, on a batch frame
    * every session but each key's trailing open one closes at
    * end-of-input ([[assembleBatchComplete]] closes those too). `turn`
    * renders one event as one transcript line. */
  def assemble(events: DataFrame, turn: Column,
               keyCol: String = "user_id", tsCol: String = "ts",
               tieCol: String = "event_id", gapSeconds: Long = 1800,
               watermark: String = "0 seconds"): Dataset[ClosedChat] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L
    val streaming = events.isStreaming
    val typed = events
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"),
        col(tieCol).cast("long").as("tie"), turn.cast("string").as("turn"))
      .withWatermark("ts", watermark)
      .as[TurnEvent]
    typed.groupByKey(_.key)
      .flatMapGroupsWithState[List[ChatSession], ClosedChat](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: String, it: Iterator[TurnEvent],
         state: GroupState[List[ChatSession]]) => {
          def finish(open: List[ChatSession],
                     closed: Seq[ChatSession]): Iterator[ClosedChat] = {
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              if (streaming) {
                val nextMicros = open.map(_.lastMicros + gapMicros).min
                state.setTimeoutTimestamp(math.max(
                  Math.floorDiv(nextMicros + 999, 1000),
                  state.getCurrentWatermarkMs() + 1))
              }
            }
            closed.map(s => render(key, s)).iterator
          }
          val sessions = state.getOption.getOrElse(Nil)
          if (state.hasTimedOut) {
            val wmMicros = state.getCurrentWatermarkMs() * 1000L
            val (done, open) =
              sessions.partition(_.lastMicros + gapMicros <= wmMicros)
            finish(open, done)
          } else {
            val evs = it.map(e => (microsOf(e.ts), e.tie, e.turn)).toArray
              .sortBy(e => (e._1, e._2))
            val folded = evs.foldLeft(sessions) { case (acc, (ts, tie, t)) =>
              fold(acc, ts, tie, t, gapMicros) }
            if (streaming) {
              val wmMicros = state.getCurrentWatermarkMs() * 1000L
              val (done, open) =
                folded.partition(_.lastMicros + gapMicros <= wmMicros)
              finish(open, done)
            } else {
              finish(folded.takeRight(1), folded.dropRight(1))
            }
          }
        })
  }

  /** Batch-mode convenience: close each key's trailing open session too
    * (a batch has no later data) via the far-future sentinel trick — the
    * sentinel's own 1-turn session stays open and is never emitted. */
  def assembleBatchComplete(events: DataFrame, turn: Column,
                            keyCol: String = "user_id", tsCol: String = "ts",
                            tieCol: String = "event_id",
                            gapSeconds: Long = 1800): DataFrame = {
    val nonNull = events.filter(col(tsCol).isNotNull)
    val sentinel = nonNull
      .select(col(keyCol), col(tsCol), col(tieCol), turn.cast("string").as("_t"))
      .groupBy(col(keyCol)).agg(max(col(tsCol)).as(tsCol))
      .withColumn(tsCol, col(tsCol) + expr(s"INTERVAL ${gapSeconds + 1} SECONDS"))
      .withColumn(tieCol, lit(-1L))
      .withColumn("_turn", lit(""))
    val withSentinel = nonNull
      .select(col(keyCol), col(tsCol), col(tieCol),
        turn.cast("string").as("_turn"))
      .unionByName(sentinel.select(col(keyCol), col(tsCol), col(tieCol),
        col("_turn")))
    assemble(withSentinel, col("_turn"), keyCol, tsCol, tieCol,
      gapSeconds).toDF()
  }
}
