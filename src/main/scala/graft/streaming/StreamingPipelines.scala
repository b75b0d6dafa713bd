package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Streaming mode (SURVEY §7.2 step 7): the same pipeline semantics compiled
  * to Structured Streaming. The reference's runtime IS a streaming system —
  * sources poll/notify, messages flow through transforms, sinks ack, state
  * persists across restarts (SURVEY §3.2). Structured Streaming gives the
  * same contract natively: checkpointed offsets ≙ section state, micro-batch
  * ≙ message, epoch commit ≙ ack, `foreachBatch` txn ≙ sink-commit-then-ack
  * ordering.
  *
  * At scale: file-source listing is incremental (only new files), state is
  * bounded by watermarks, and every transform below is a narrow op or a
  * keyed aggregation with map-side partials.
  */
object StreamingPipelines {

  /** File-watch source (reference S6/S7 dir/file watchers,
    * `sections/dir/src/source.rs:235-300`): Spark's file stream source
    * tracks processed files in the checkpoint — the `start_after` cursor
    * generalized. `maxFilesPerTrigger` ≙ the reference's depth-1
    * backpressure channel. */
  def fileSource(spark: SparkSession, path: String, schema: StructType,
                 format: String = "parquet", maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .format(format).load(path)

  /** Kafka stream source (reference S9 stub made real). */
  def kafkaSource(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic).load()
      .select(col("topic").as("origin"), col("value"))

  /** Tumbling event-time window aggregation with late-data bound. */
  def tumblingCounts(events: DataFrame, tsCol: String, windowLen: String,
                     watermark: String, groupCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), windowLen).getField("start").as("window_start")
        +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))

  /** Session windows via the built-in session_window (gap-based). */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String,
                    watermark: String, keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap).getField("start").as("session_start")
        +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup: drop duplicates on key within the watermark
    * horizon — the streaming form of the reference's INSERT OR IGNORE
    * idempotent sink (D1). State size bounded by the watermark. */
  def dedup(events: DataFrame, tsCol: String, watermark: String,
            keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Select the streaming state-store provider for queries started on this
    * session. The default HDFS-backed store keeps every active key's state
    * ON THE EXECUTOR HEAP — fine at test scale, an OOM ceiling at 100×
    * active-key cardinality (sessions/dedup keys). `rocksdb` switches to
    * Spark's RocksDB provider: state lives off-heap/on-disk per executor
    * with the same checkpoint contract, so state capacity scales with disk,
    * not heap. Takes effect for queries STARTED after the call (the
    * provider is captured at query start; restarts from the same
    * checkpoint keep their store format). */
  def useStateStore(spark: SparkSession, provider: String): Unit = {
    val cls = provider match {
      case "hdfs" =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      // explicit provider class pass-through (custom stores)
      case other if other.contains(".") => other
      case other => throw new IllegalArgumentException(
        s"state_store must be hdfs|rocksdb|<provider class>, got $other")
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
  }

  /** Transactional sink with ack-after-commit ordering: `foreachBatch`
    * runs the write txn, and only when it returns does Spark commit the
    * epoch to the checkpoint — the reference's ack protocol
    * (`section/src/command_channel.rs:68-80`) with exactly-once upgrade
    * when the write is idempotent (dedup key / overwrite-by-partition). */
  def ackSink(df: DataFrame, checkpoint: String,
              mode: OutputMode = OutputMode.Update())
             (write: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(mode)
      .foreachBatch { (batch: DataFrame, epochId: Long) => write(batch, epochId) }

  /** Origin-multiplexed streaming sink: one stream carries many logical
    * tables distinguished by the `origin` column; each micro-batch fans out
    * to one write per origin (the reference routes messages to a table
    * named by the message origin inside a running pipeline,
    * `sections/sqlite_connector/src/destination.rs:67` — this is its
    * streaming counterpart; [[graft.sources.Sinks.routeByOrigin]] is the
    * batch one). The batch is persisted so the distinct-origin scan and the
    * per-origin filtered writes are one materialization, and ack ordering
    * holds: the epoch commits only after EVERY origin's write returned —
    * a crash mid-fan-out replays the whole batch (at-least-once; pair with
    * idempotent per-origin writes for effectively-once). */
  def ackSinkByOrigin(df: DataFrame, checkpoint: String,
                      mode: OutputMode = OutputMode.Update())
                     (writeOne: (String, DataFrame, Long) => Unit): DataStreamWriter[Row] =
    ackSink(df, checkpoint, mode) { (batch, epochId) =>
      batch.persist()
      try graft.sources.Sinks.routeByOrigin(batch)(
        (origin, slice) => writeOne(origin, slice, epochId))
      finally batch.unpersist()
    }

  /** Run a streaming query over a static directory to completion — used by
    * tests and the Verify harness to prove stream/batch parity on the same
    * inputs. */
  def runToCompletion(writer: DataStreamWriter[Row]): Unit = {
    val q = writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Explicit checkpoint dir for a short-lived verify/bench stream,
    * under the app-id-keyed stage root: a stream started WITHOUT a
    * checkpointLocation gets a `/tmp/temporary-<uuid>` dir whose
    * deletion is best-effort (Spark warns so on every start) — the
    * stage root's shutdown reaper owns these instead, and the app id
    * keeps concurrent JVMs collision-free. `name` callers already make
    * unique per query; the counter guards reuse within one query. */
  def scratchCheckpoint(spark: SparkSession, name: String): String =
    graft.operators.Staging.defaultStageRoot(spark) + "/ckpt_" +
      name.map(c => if (c.isLetterOrDigit || c == '-' || c == '_') c
        else '-') +
      "_" + graft.operators.Staging.stageCounter.incrementAndGet()

  /** Memory-sink helper: materialize a streaming frame synchronously and
    * return the result table. */
  def collectStream(spark: SparkSession, df: DataFrame, name: String,
                    mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", scratchCheckpoint(spark, name))
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }
}
