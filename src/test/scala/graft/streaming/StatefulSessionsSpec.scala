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

  test("late event BEFORE an open session forms its own session (session_window parity)") {
    val root = java.nio.file.Files.createTempDirectory("graft_late").toString
    def write(sub: String, ts: String): Unit =
      Seq(("u1", java.sql.Timestamp.valueOf(ts))).toDF("user_id", "ts")
        .coalesce(1).write.parquet(s"$root/in/$sub")
    def run(): Unit = {
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$root/in").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
        .parquet(s"$root/in")
      // flatMapGroupsWithState(Append) requires an Append-mode sink
      val w = StatefulSessions.sessionize(stream, "user_id", "ts", 1800L,
          watermark = "2 hours").toDF()
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$root/out")
        }
      StreamingPipelines.runToCompletion(w)
    }
    write("a", "2024-01-01 10:00:00")
    run()
    // late but within the 2h lateness horizon, 30+ min BEFORE the open
    // session: must become its own session, not be absorbed
    write("b", "2024-01-01 09:00:00")
    run()
    // far-future event pushes the watermark past both close edges
    write("c", "2024-01-01 23:00:00")
    run()
    val got = spark.read.parquet(s"$root/out")
      .select("session_start", "n")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
    assert(got == Set(("2024-01-01 09:00:00.0", 1L), ("2024-01-01 10:00:00.0", 1L)),
      s"got $got")
  }

  test("late event just before an open session EXTENDS its start backwards") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // batch path exercises the same fold: 10:00 then late 09:45 merge
    // (gap 30min), and the session start extends to 09:45
    val events = Seq(("u1", ts("2024-01-01 10:00:00")), ("u1", ts("2024-01-01 09:45:00")))
      .toDF("user_id", "ts")
    val out = StatefulSessions.sessionizeBatchComplete(events, "user_id", "ts", 1800L)
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(out == Set(("2024-01-01 09:45:00.0", 2L)), s"got $out")
  }

  test("null timestamps are dropped, not crashed on") {
    val events = Seq(("u1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
        ("u1", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("user_id", "ts")
    val out = StatefulSessions.sessionizeBatchComplete(events, "user_id", "ts", 1800L)
    assert(out.count() == 1)
  }

  test("sessionize pipeline on the RocksDB state store: same sessions as the default store") {
    // the default HDFS-backed store holds all active-key state on the
    // executor heap; RocksDB is the disk-backed option for 100× key
    // cardinality — wired through the section config, results must be
    // identical
    val tmp = java.nio.file.Files.createTempDirectory("graft_rocks").toString
    Tables.events(spark, TestSpark.sf).select($"user_id", $"ts")
      .write.parquet(s"$tmp/in")
    def run(sub: String, extraCfg: String): Set[(String, java.sql.Timestamp, Long)] = {
      val spec = graft.plans.PipelineSpec.fromJson(s"""{"sections":[
        {"id":"src","name":"stream_parquet_source","config":{"path":"$tmp/in"}},
        {"id":"sess","name":"sessionize",
         "config":{"key_column":"user_id","ts_column":"ts","gap_seconds":"$gapSec"}},
        {"id":"sink","name":"stream_parquet_destination",
         "config":{"path":"$tmp/out_$sub","checkpoint":"$tmp/ckpt_$sub",
                   "output_mode":"append"$extraCfg}}],
        "edges":[["src","sess"],["sess","sink"]]}""")
      graft.plans.PipelineCompiler.run(spark, spec)
      spark.read.parquet(s"$tmp/out_$sub")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    }
    val default = run("hdfs", "")
    val rocks = try run("rocks", ""","state_store":"rocksdb"""")
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert(rocks.nonEmpty, "no sessions closed — the parity check proved nothing")
    assert(rocks == default,
      s"provider changed results: onlyRocks=${(rocks -- default).take(3)} " +
      s"onlyDefault=${(default -- rocks).take(3)}")
    // the RocksDB provider actually ran: its checkpoint state files are
    // zip snapshots / changelogs, never the HDFS provider's .delta
    def stateFiles(sub: String): Seq[String] = {
      val d = new java.io.File(s"$tmp/ckpt_$sub/state")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(d).map(_.getName)
    }
    assert(stateFiles("hdfs").exists(_.endsWith(".delta")))
    assert(stateFiles("rocks").exists(n =>
      n.endsWith(".zip") || n.endsWith(".changelog")))
    assert(!stateFiles("rocks").exists(_.endsWith(".delta")))
  }

  test("streaming: sessions close via event-time timeout, state stays bounded") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val stream = Tables.normalizeEventsTs(spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(TestSpark.sf))
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
