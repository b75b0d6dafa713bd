package graft.sources

import graft.plans.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental kafka-wire ingestion — the reference's stateful-source
  * contract applied to the pure-JDK kafka path: per-partition offsets are
  * the watermark, persisted in the section [[StateStore]] strictly AFTER
  * the sink commit (`section/src/command_channel.rs:68-80`'s
  * ack-after-commit), so a crash between sink and state write replays
  * exactly one slice — at-least-once, effectively-once when the sink is
  * idempotent (pair with `Sinks.idempotentParquetAppend` keyed on
  * (partition, offset)).
  *
  * Offsets are tracked PER PARTITION (`offset_<p>` keys): a single global
  * watermark would be wrong the moment two partitions advance at
  * different rates. State volume is O(#partitions) longs — a cursor, not
  * data.
  *
  * The slice is BOUNDED BY A SNAPSHOT, not by "whatever the log holds
  * when a task runs": tick() snapshots every partition's high watermark
  * once up front, reads exactly `[stored, snapshot)`, and advances state
  * to the snapshot. An unbounded read-to-watermark would be
  * nondeterministic under recomputation — if a cached slice is lost
  * (executor failure, speculative retry) after the sink ran, the rebuild
  * would re-fetch PAST the original watermark and the max-offset advance
  * would mark those never-sunk records done: silent loss. With fixed
  * bounds a recompute rebuilds byte-identical rows.
  */
object KafkaWireCursor {

  /** One tick: snapshot the high watermarks, read every partition from
    * its persisted offset to its snapshotted watermark, hand the slice
    * to `sink`, then advance the stored offsets TO THE SNAPSHOT.
    * Returns the number of rows processed (0 = caught up). */
  def tick(spark: SparkSession, store: StateStore, pipeline: String,
           section: String, host: String, port: Int, topic: String,
           dialect: KafkaWire.Dialect = KafkaWire.V0)
          (sink: DataFrame => Unit): Long = {
    val offsets = store.load(pipeline, section).collect {
      case (k, v) if k.startsWith("offset_") =>
        k.stripPrefix("offset_").toInt -> v.toLong
    }
    // the batch boundary, fixed BEFORE any task runs (O(#partitions)
    // longs over one RPC) — every fetch below reads [from, until) so a
    // recomputed task can never observe records this tick didn't claim
    val parts = KafkaWire.partitions(host, port, topic, dialect)
    val until = KafkaWire.offsetsAt(host, port, topic, parts, -1L, dialect)
    val lagging = until.exists { case (p, u) => u > offsets.getOrElse(p, 0L) }
    if (!lagging) return 0L
    val slice = Sources.kafkaWireReadRange(
      spark, host, port, topic, offsets, until, dialect).persist()
    try {
      val n = slice.count()
      if (n > 0) sink(slice)
      // state write strictly after the sink returned (ack-after-commit);
      // advancing to the snapshot rather than max(offset-in-frame) also
      // steps over log ranges retention truncated mid-tick (n may be 0)
      val advanced = until.toSeq.sortBy(_._1)
        .map { case (p, u) => s"offset_$p" -> u.toString }
      store.set(pipeline, section, advanced: _*)
      n
    } finally { slice.unpersist(); () }
  }

  /** Drive ticks until a tick processes nothing (caught up) — the
    * reference's zero-interval catch-up loop
    * (`sections/postgres_connector/src/source.rs:114-125`). */
  def catchUp(spark: SparkSession, store: StateStore, pipeline: String,
              section: String, host: String, port: Int, topic: String,
              maxTicks: Int = 1000,
              dialect: KafkaWire.Dialect = KafkaWire.V0)
             (sink: DataFrame => Unit): Long = {
    var total = 0L
    var ticks = 0
    var n = -1L
    while (n != 0L && ticks < maxTicks) {
      n = tick(spark, store, pipeline, section, host, port, topic, dialect)(sink)
      total += n
      ticks += 1
    }
    total
  }
}
