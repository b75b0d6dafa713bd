package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatefulSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val gapSec = 1800L // 30 minutes, matches the q23 session scale

  /** Built-in session_window reference result: (key, start, n). The group
    * key must be the session_window STRUCT itself — extracting .start in
    * the groupBy would defeat the gap-merge rewrite. */
  private def builtin() = Tables.events(spark, TestSpark.sf)
    .groupBy($"user_id".cast("string").as("key"),
      session_window($"ts", s"$gapSec seconds").as("w"))
    .agg(count(lit(1)).as("n"))
    .select($"key", $"w.start".as("session_start"), $"n")

  test("batch: custom flatMapGroupsWithState sessions equal session_window exactly") {
    val custom = StatefulSessions.sessionizeBatchComplete(
        Tables.events(spark, TestSpark.sf).select($"user_id", $"ts"),
        "user_id", "ts", gapSec)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val ref = builtin()
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(custom == ref,
      s"custom=${custom.size} builtin=${ref.size}, " +
      s"onlyCustom=${(custom -- ref).take(3)} onlyRef=${(ref -- custom).take(3)}")
  }

  test("streaming: sessions close via event-time timeout, state stays bounded") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(TestSpark.sf)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select($"user_id", $"ts")
    val closed = StreamingPipelines.collectStream(spark,
        StatefulSessions.sessionize(stream, "user_id", "ts", gapSec).toDF(),
        s"st_sessions_${System.nanoTime()}",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val ref = builtin()
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    val nKeys = ref.map(_._1).size
    // every emitted session is a true session_window session, and at most
    // one (the trailing open one) per key can still be held as state
    assert(closed.subsetOf(ref), s"stray sessions: ${(closed -- ref).take(3)}")
    assert(closed.size >= ref.size - ref.map(_._1).toSeq.distinct.size,
      s"closed=${closed.size} ref=${ref.size} keys=$nKeys")
  }
}
