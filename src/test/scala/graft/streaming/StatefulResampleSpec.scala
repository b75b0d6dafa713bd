package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The streaming forward-fill resampler's emission discipline: buckets
  * finalize with the watermark, gap rows only ever materialize INSIDE the
  * observed range, late data within the horizon lands in its bucket, and
  * the multi-batch incremental path produces exactly the batch grid. */
class StatefulResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("batch: gaps fill forward, per-bucket latest wins by (ts, tie)") {
    val events = Seq(
      // bucket 10:00 — two observations, latest (10:20) wins
      ("u1", ts("2024-01-01 10:05:00"), 1L, 1.0),
      ("u1", ts("2024-01-01 10:20:00"), 2L, 2.0),
      // 11:00 and 12:00 empty — gap rows carry 2.0
      ("u1", ts("2024-01-01 13:10:00"), 3L, 9.0),
      // same-timestamp tie inside 13:00: higher tie (4) wins
      ("u1", ts("2024-01-01 13:10:00"), 4L, 7.0),
      ("u2", ts("2024-01-01 00:30:00"), 5L, 5.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = StatefulResample.resample(events, "user_id", "ts",
        "event_id", "value", bucketSeconds = 3600L)
      .collect().map(r => (r.key, r.grid_ts.toString, r.n_obs,
        r.filled_value.get)).toSet
    assert(got == Set(
      ("u1", "2024-01-01 10:00:00.0", 2L, 2.0),
      ("u1", "2024-01-01 11:00:00.0", 0L, 2.0),
      ("u1", "2024-01-01 12:00:00.0", 0L, 2.0),
      ("u1", "2024-01-01 13:00:00.0", 2L, 7.0),
      ("u2", "2024-01-01 00:00:00.0", 1L, 5.0)), s"got $got")
  }

  test("streaming multi-batch: incremental emissions concatenate to the batch grid") {
    val root = java.nio.file.Files.createTempDirectory("graft_rs").toString
    def write(sub: String, rows: Seq[(String, String, Long, Double)]): Unit =
      rows.map { case (u, t, e, v) => (u, ts(t), e, v) }
        .toDF("user_id", "ts", "event_id", "value")
        .coalesce(1).write.parquet(s"$root/in/$sub")
    def run(): Unit = {
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$root/in").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
        .parquet(s"$root/in")
      val w = StatefulResample.resample(stream, "user_id", "ts",
          "event_id", "value", bucketSeconds = 3600L, watermark = "1 hour")
        .toDF()
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$root/out")
        }
      StreamingPipelines.runToCompletion(w)
    }
    write("a", Seq(("u1", "2024-01-01 10:15:00", 1L, 1.0)))
    run()
    // late-but-in-horizon observation for a LATER bucket plus the
    // watermark driver; 11:00 stays a gap
    write("b", Seq(("u1", "2024-01-01 12:40:00", 2L, 4.0)))
    run()
    // sentinel far ahead: finalizes every pending bucket
    write("c", Seq(("sentinel", "2024-01-02 12:00:00", 9L, 0.0)))
    run()
    val got = spark.read.parquet(s"$root/out")
      .filter($"key" === "u1")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      ("u1", "2024-01-01 10:00:00.0", 1L, 1.0),
      ("u1", "2024-01-01 11:00:00.0", 0L, 1.0),
      ("u1", "2024-01-01 12:00:00.0", 1L, 4.0)), s"got $got")
    // no grid row was ever invented beyond the last real observation
    assert(!got.exists(_._2 > "2024-01-01 12:00:00.0"))
  }

  test("streaming: drained-key state drops after the idle retention horizon") {
    // retention = 2 buckets: once u1's buffer drains and the watermark
    // passes 2 grid widths past its cursor, the carry+cursor residue is
    // REMOVED — a much later u1 observation restarts the grid at its own
    // bucket with NO gap rows bridging the idle span (the state-boundedness
    // contract: idle keys cannot accumulate forever under key churn)
    val root = java.nio.file.Files.createTempDirectory("graft_rs_idle").toString
    def write(sub: String, rows: Seq[(String, String, Long, Double)]): Unit =
      rows.map { case (u, t, e, v) => (u, ts(t), e, v) }
        .toDF("user_id", "ts", "event_id", "value")
        .coalesce(1).write.parquet(s"$root/in/$sub")
    def run(): Unit = {
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$root/in").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
        .parquet(s"$root/in")
      val w = StatefulResample.resample(stream, "user_id", "ts",
          "event_id", "value", bucketSeconds = 3600L, watermark = "1 hour",
          idleRetentionBuckets = 2)
        .toDF()
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$root/out")
        }
      StreamingPipelines.runToCompletion(w)
    }
    write("a", Seq(("u1", "2024-01-01 10:15:00", 1L, 1.0)))
    run()
    // drain u1 (wm 19:00 > 10:00 bucket end) and register its idle timeout
    write("b", Seq(("s", "2024-01-01 20:00:00", 8L, 0.0)))
    run()
    // advance the watermark past the retention horizon → timeout fires,
    // u1 state removed
    write("c", Seq(("s", "2024-01-01 23:00:00", 9L, 0.0)))
    run()
    // u1 returns AFTER the horizon: fresh grid, no bridge to the old one
    write("d", Seq(("u1", "2024-01-02 05:30:00", 2L, 7.0)))
    run()
    write("e", Seq(("s", "2024-01-02 12:00:00", 10L, 0.0)))
    run()
    val got = spark.read.parquet(s"$root/out")
      .filter($"key" === "u1")
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set(
      ("2024-01-01 10:00:00.0", 1L, 1.0),
      ("2024-01-02 05:00:00.0", 1L, 7.0)),
      s"expected a restarted grid with no idle-span gap rows, got $got")
  }
}
