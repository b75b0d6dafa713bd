package graft.sources

import graft.plans.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  */
object KafkaWireCursor {

  /** One tick: read every partition from its persisted offset to the
    * current high watermark, hand the slice to `sink`, then advance the
    * stored offsets. Returns the number of rows processed (0 = caught
    * up; state untouched). */
  def tick(spark: SparkSession, store: StateStore, pipeline: String,
           section: String, host: String, port: Int, topic: String)
          (sink: DataFrame => Unit): Long = {
    val offsets = store.load(pipeline, section).collect {
      case (k, v) if k.startsWith("offset_") =>
        k.stripPrefix("offset_").toInt -> v.toLong
    }
    val slice = Sources.kafkaWireReadFrom(spark, host, port, topic, offsets)
      .persist()
    try {
      val n = slice.count()
      if (n > 0) {
        sink(slice)
        // O(#partitions) rows to the driver; state write strictly after
        // the sink returned — ack-after-commit
        val advanced = slice.groupBy(col("partition"))
          .agg(max(col("offset")).as("m")).collect()
          .map(r => s"offset_${r.getInt(0)}" -> (r.getLong(1) + 1).toString)
        store.set(pipeline, section, advanced.toIndexedSeq: _*)
      }
      n
    } finally { slice.unpersist(); () }
  }

  /** Drive ticks until a tick processes nothing (caught up) — the
    * reference's zero-interval catch-up loop
    * (`sections/postgres_connector/src/source.rs:114-125`). */
  def catchUp(spark: SparkSession, store: StateStore, pipeline: String,
              section: String, host: String, port: Int, topic: String,
              maxTicks: Int = 1000)(sink: DataFrame => Unit): Long = {
    var total = 0L
    var ticks = 0
    var n = -1L
    while (n != 0L && ticks < maxTicks) {
      n = tick(spark, store, pipeline, section, host, port, topic)(sink)
      total += n
      ticks += 1
    }
    total
  }
}
