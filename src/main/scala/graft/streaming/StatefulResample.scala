package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING time-series resample with forward fill — the streaming twin
  * of the batch `q35_resample_ffill` shape: per key, a dense fixed-width
  * bucket grid from the key's first observed bucket to its last, each
  * grid row carrying the per-bucket observation count and the latest
  * observation's value carried forward across gaps.
  *
  * Emission discipline (what makes it correct under late data):
  *  - a bucket is FINAL only once the watermark passes its end — until
  *    then a late observation could still change its count/value;
  *  - a final bucket is EMITTED only up to the key's max KNOWN
  *    observation bucket — beyond that the grid's true extent is still
  *    unknown (a later event may extend it), so trailing empty buckets
  *    stay pending until an observation or the terminal watermark
  *    advance proves them in-range — they are then emitted as gap rows,
  *    never invented beyond the last real observation.
  *
  * State per key: the forward-fill carry, the next bucket to emit, and
  * the buffered not-yet-final observations — bounded by the watermark
  * horizon (observations final-ize and leave the buffer as the watermark
  * advances), never by history. Emitted buckets can never be
  * contradicted: Spark drops input rows below the watermark before the
  * stateful operator, and every emitted bucket's end is ≤ the watermark.
  *
  * Idle-key retention: a key whose buffer has drained keeps only its
  * carry + cursor, and that residue is dropped `idleRetentionBuckets`
  * grid widths after the last emitted bucket (event-time timeout). A key
  * resuming AFTER that horizon restarts its grid at the new observation —
  * the idle span's gap rows and the old carry are intentionally lost, in
  * exchange total state is bounded by recently-active keys rather than
  * by every key ever seen (under key churn the latter grows forever).
  */
object StatefulResample {

  final case class Obs(key: String, ts: Timestamp, tie: Long, v: Double)

  /** One buffered observation: (bucket, eventMicros, tie, value). */
  final case class Buffered(bucket: Long, micros: Long, tie: Long, v: Double)

  final case class ResampleState(nextBucket: Long, carry: Option[Double],
                                 buf: List[Buffered])

  final case class GridRow(key: String, grid_ts: Timestamp, n_obs: Long,
                           filled_value: Option[Double])

  private def microsOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private def tsFromMicros(micros: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  /** Resample `events` (keyCol, tsCol, tieCol, valCol) onto a
    * `bucketSeconds` grid. Emits one [[GridRow]] per (key, bucket) —
    * in streaming Append mode rows emit as their buckets finalize; on a
    * batch frame the single group call emits each key's whole grid. */
  def resample(events: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, valCol: String, bucketSeconds: Long,
               watermark: String = "1 hour",
               idleRetentionBuckets: Int = 48): Dataset[GridRow] = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(idleRetentionBuckets > 0, "idleRetentionBuckets must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val bucketMicros = bucketSeconds * 1000000L
    val streaming = events.isStreaming
    val typed = events
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"),
        col(tieCol).cast("long").as("tie"), col(valCol).cast("double").as("v"))
      .withWatermark("ts", watermark)
      .as[Obs]

    typed.groupByKey(_.key)
      .flatMapGroupsWithState[ResampleState, GridRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: String, it: Iterator[Obs], state: GroupState[ResampleState]) => {
          def bucketOf(m: Long) = Math.floorDiv(m, bucketMicros) * bucketMicros
          val st0 = state.getOption.getOrElse(ResampleState(-1L, scala.None, Nil))
          val incoming = it.map { o =>
            val m = microsOf(o.ts)
            Buffered(bucketOf(m), m, o.tie, o.v)
          }.toList
          var buf = st0.buf ++ incoming
          var carry = st0.carry
          var next =
            if (st0.nextBucket >= 0 || buf.isEmpty) st0.nextBucket
            else buf.iterator.map(_.bucket).min
          // batch: the one group call sees everything — finalize all
          val wm = if (streaming) state.getCurrentWatermarkMs() * 1000L
            else Long.MaxValue
          val out = scala.collection.mutable.ListBuffer.empty[GridRow]
          if (next >= 0 && buf.nonEmpty) {
            val maxKnown = buf.iterator.map(_.bucket).max
            var b = next
            while (b + bucketMicros <= wm - (if (streaming) 0L else 1L) &&
                   b <= maxKnown) {
              val (inB, rest) = buf.partition(_.bucket == b)
              if (inB.nonEmpty)
                carry = Some(inB.maxBy(o => (o.micros, o.tie)).v)
              out += GridRow(key, tsFromMicros(b), inB.size.toLong, carry)
              buf = rest
              b += bucketMicros
            }
            next = b
          }
          if (!streaming || (buf.isEmpty && st0.buf.isEmpty && incoming.isEmpty)) {
            state.remove()
          } else {
            state.update(ResampleState(next, carry, buf))
            if (streaming) {
              // wake timestamps are micros rounded UP to millis, and
              // strictly above the current watermark or Spark rejects them
              val edge =
                if (buf.nonEmpty) next + bucketMicros // next bucket finalizes
                else next + bucketMicros * idleRetentionBuckets.toLong
              // drained keys get the retention horizon: when it fires with
              // nothing buffered and nothing incoming, the branch above
              // removes the state — idle keys cannot accumulate forever
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(edge + 999, 1000),
                state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
        })
  }
}
