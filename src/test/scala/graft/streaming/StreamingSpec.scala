package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming tumbling window equals batch on the same input") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"${TestSpark.sf}/events.parquet"
    val raw = spark.read.parquet(path)
    val stream = Tables.normalizeEventsTs(spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(TestSpark.sf))
    val agg = stream.groupBy(
        window($"ts", "5 minutes").getField("start").as("ws"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val got = StreamingPipelines.collectStream(spark, agg, "st_test")
      .orderBy("ws", "event_type").collect()

    val batch = Tables.events(spark, TestSpark.sf).groupBy(
        window($"ts", "5 minutes").getField("start").as("ws"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("ws", "event_type").collect()
    assert(got.sameElements(batch))
  }

  test("narrow corpus ops (weighted mix, decon prefilter) run unchanged on streams") {
    // mixWeighted is stateless scan+hash+filter — the SAME operator code
    // must compile into a streaming plan (micro-batched crawl ingestion
    // mixing domains on the fly), with results identical to batch
    val path = s"${TestSpark.sf}/documents.parquet"
    val raw = spark.read.parquet(path)
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(TestSpark.sf)
    val rates = Seq("en" -> 0.8, "de" -> 0.5, "es" -> 0.25, "fr" -> 0.5, "zh" -> 0.1)
    val got = StreamingPipelines.collectStream(spark,
        graft.operators.Corpus.mixWeighted(stream, rates), "st_mix",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("doc_id").collect()
    val batch = graft.operators.Corpus.mixWeighted(raw, rates)
      .orderBy("doc_id").collect()
    assert(got.sameElements(batch) && batch.nonEmpty)
  }

  test("dedupLines runs unchanged on a stream (narrow ops are mode-agnostic)") {
    val path = s"${TestSpark.sf}/documents.parquet"
    val raw = spark.read.parquet(path)
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(TestSpark.sf)
    val got = StreamingPipelines.collectStream(spark,
        graft.operators.Corpus.dedupLines(stream), "st_dedup_lines",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("doc_id").collect()
    val batch = graft.operators.Corpus.dedupLines(raw)
      .orderBy("doc_id").collect()
    assert(got.sameElements(batch) && batch.nonEmpty)
  }

  test("stream-static join enriches a stream against a dimension table") {
    // the lookup-enrichment shape: dimension stays a static frame (re-read
    // per micro-batch, broadcast by AQE), facts stream past it
    val path = s"${TestSpark.sf}/documents.parquet"
    val raw = spark.read.parquet(path)
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(TestSpark.sf)
      .select($"doc_id", $"lang")
    val dim = Seq(("en", "english"), ("de", "german"), ("es", "spanish"),
      ("fr", "french"), ("zh", "chinese")).toDF("lang", "lang_name")
    val got = StreamingPipelines.collectStream(spark,
        stream.join(dim, "lang"), "st_static_join",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("doc_id").collect()
    val batch = raw.select($"doc_id", $"lang").join(dim, "lang")
      .orderBy("doc_id").collect()
    assert(got.sameElements(batch) && batch.length == raw.count())
  }

  test("ackSink foreachBatch commits before checkpoint epoch advances") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"${TestSpark.sf}/events.parquet"
    val raw = spark.read.parquet(path)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(TestSpark.sf)
    var batches = 0
    val writer = StreamingPipelines.ackSink(stream, ckpt) { (batch, epoch) =>
      batches += 1
      batch.write.mode("append").parquet(s"$out/data")
    }
    StreamingPipelines.runToCompletion(writer)
    assert(batches >= 1)
    assert(spark.read.parquet(s"$out/data").count() == raw.count())
    // restart from checkpoint: no new data → no new batches, no duplicates
    val writer2 = StreamingPipelines.ackSink(
      spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet").parquet(TestSpark.sf), ckpt) { (b, e) =>
      b.write.mode("append").parquet(s"$out/data")
    }
    StreamingPipelines.runToCompletion(writer2)
    assert(spark.read.parquet(s"$out/data").count() == raw.count(),
      "checkpoint must prevent reprocessing")
  }

  test("ackSinkByOrigin fans a multiplexed stream out to per-origin targets") {
    val root = java.nio.file.Files.createTempDirectory("graft_fanout").toString
    Seq(("t1", 1), ("t2", 2), ("t1", 3), ("t2", 4), ("t2", 5))
      .toDF("origin", "v").write.parquet(s"$root/in")
    val schema = spark.read.parquet(s"$root/in").schema
    var writes = 0
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$root/in")
      val w = StreamingPipelines.ackSinkByOrigin(stream, s"$root/ckpt") {
        (origin, slice, _) =>
          writes += 1
          slice.write.mode("append").parquet(s"$root/out/$origin")
      }
      StreamingPipelines.runToCompletion(w)
    }
    run()
    assert(writes == 2, "one write per origin")
    assert(spark.read.parquet(s"$root/out/t1").as[Int].collect().sorted.toSeq == Seq(1, 3))
    assert(spark.read.parquet(s"$root/out/t2").as[Int].collect().sorted.toSeq == Seq(2, 4, 5))
    // ack ordering: the committed epoch is never refanned on restart
    run()
    assert(writes == 2, "restart from checkpoint must not reprocess")
    assert(spark.read.parquet(s"$root/out/t1").count() == 2)
  }

  test("streaming dedup within watermark") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val data = Seq(("k1", ts), ("k1", ts), ("k2", ts)).toDF("k", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    data.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(data.schema).parquet(s"$dir/in")
    val dd = StreamingPipelines.dedup(stream, "ts", "1 hour", Seq("k"))
    val got = StreamingPipelines.collectStream(spark, dd, "st_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(got.count() == 2)
  }
}
