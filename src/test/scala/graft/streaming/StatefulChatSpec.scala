package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming chat assembly: transcripts from the custom-state path must
  * match the batch operator on identical input, and the streaming close
  * rules (watermark, late merge, tie order) must produce exact strings. */
class StatefulChatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch-complete streaming operator matches the batch chatAssembly transcripts") {
    val events = Tables.events(spark, TestSpark.sf)
    val turn = concat(lit("["), $"event_type", lit("]"))
    val custom = StatefulChat.assembleBatchComplete(events, turn)
      .select($"key", $"n_turns", $"transcript")
      .as[(String, Long, String)].collect()
      .map { case (k, n, t) => (k.toLong, n, t) }.toSet
    val batch = graft.operators.Corpus.chatAssembly(events, turn)
      .select($"user_id", $"n_turns", $"transcript")
      .as[(Long, Long, String)].collect().toSet
    assert(custom.nonEmpty)
    assert(custom == batch,
      s"custom=${custom.size} batch=${batch.size}, " +
      s"onlyCustom=${(custom -- batch).take(2)} onlyBatch=${(batch -- custom).take(2)}")
  }

  test("streaming: watermark closes sessions with exact, tie-ordered transcripts") {
    val root = java.nio.file.Files.createTempDirectory("graft_chat").toString
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    def write(sub: String, rows: Seq[(String, java.sql.Timestamp, Long, String)]): Unit =
      rows.toDF("user_id", "ts", "event_id", "event_type")
        .coalesce(1).write.parquet(s"$root/in/$sub")
    def run(): Unit = {
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$root/in").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
        .parquet(s"$root/in")
      val w = StatefulChat.assemble(stream,
          turn = concat(lit("["), col("event_type"), lit("]")),
          gapSeconds = 1800L, watermark = "2 hours").toDF()
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$root/out")
        }
      StreamingPipelines.runToCompletion(w)
    }
    // session 1: two same-timestamp turns (tie order must hold) + one more
    write("a", Seq(
      ("u1", ts("2024-01-01 10:00:00"), 2L, "b"),
      ("u1", ts("2024-01-01 10:00:00"), 1L, "a"),
      ("u1", ts("2024-01-01 10:10:00"), 3L, "c")))
    run()
    // session 2 starts; watermark still behind session 1's close edge
    write("b", Seq(("u1", ts("2024-01-01 13:00:00"), 4L, "d")))
    run()
    // far-future event pushes the watermark past both close edges
    write("c", Seq(("u1", ts("2024-01-02 09:00:00"), 5L, "e")))
    run()
    val got = spark.read.parquet(s"$root/out")
      .select("session_start", "n_turns", "transcript")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getString(2)))
      .toSet
    assert(got == Set(
      ("2024-01-01 10:00:00.0", 3L, "[a]\n[b]\n[c]"),
      ("2024-01-01 13:00:00.0", 1L, "[d]")), s"got $got")
  }

  test("late turn merges into an open session and lands in transcript order") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // batch path exercises the same fold: 10:00 "x" then LATE 09:45 "w"
    // merge (gap 30min) — the transcript must lead with the late turn
    val events = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1L, "x"),
      ("u1", ts("2024-01-01 09:45:00"), 2L, "w"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = StatefulChat.assembleBatchComplete(events, col("event_type"))
      .select("session_start", "n_turns", "transcript")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getString(2)))
      .toSet
    assert(out == Set(("2024-01-01 09:45:00.0", 2L, "w\nx")), s"got $out")
  }
}
