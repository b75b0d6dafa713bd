package graft.sources

import graft.TestSpark
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The kafka-wire DataSource V2 end to end against [[EmbeddedKafkaBroker]]
  * over real sockets: micro-batch planning from ListOffsets watermarks,
  * checkpointed offsets (stop → produce → restart replays NOTHING),
  * `max_offsets_per_trigger` admission control, `starting_offsets`, and
  * the batch read path — all without a kafka connector jar. */
class KafkaWireStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def produce(b: EmbeddedKafkaBroker, topic: String, p: Int,
                      ids: Range): Unit =
    KafkaWire.produce(b.host, b.port, topic, p,
      ids.map(i => (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"))))

  test("offset json round-trips and rejects garbage") {
    val o = Map(0 -> 12L, 1 -> 3L, 10 -> 0L)
    assert(KafkaWireStream.parseOffsets(KafkaWireStream.renderOffsets(o)) == o)
    assert(KafkaWireStream.renderOffsets(o) == """{"0":12,"1":3,"10":0}""")
    assert(KafkaWireStream.parseOffsets("{}") == Map.empty[Int, Long])
    intercept[IllegalArgumentException] {
      KafkaWireStream.parseOffsets("""{"0"}""")
    }
  }

  test("capAdvance: proportional to lag, never stalls a lagging partition") {
    // under the cap → straight to the high watermark
    assert(KafkaWireStream.capAdvance(Map(0 -> 0L), Map(0 -> 5L), 10L) ==
      Map(0 -> 5L))
    // 10 total lag, cap 5: shares 5*1/10=0→1 (progress floor), 5*9/10=4
    assert(KafkaWireStream.capAdvance(
      Map(0 -> 0L, 1 -> 0L), Map(0 -> 1L, 1 -> 9L), 5L) ==
      Map(0 -> 1L, 1 -> 4L))
    // a caught-up partition takes nothing
    assert(KafkaWireStream.capAdvance(
      Map(0 -> 7L, 1 -> 0L), Map(0 -> 7L, 1 -> 100L), 10L) ==
      Map(0 -> 7L, 1 -> 10L))
  }

  test("ListOffsets v0: earliest and latest watermarks over the wire") {
    val b = new EmbeddedKafkaBroker(numPartitions = 2)
    try {
      produce(b, "lo", 0, 0 until 4)
      produce(b, "lo", 1, 4 until 7)
      val parts = KafkaWire.partitions(b.host, b.port, "lo")
      assert(KafkaWire.offsetsAt(b.host, b.port, "lo", parts, -2L) ==
        Map(0 -> 0L, 1 -> 0L))
      assert(KafkaWire.offsetsAt(b.host, b.port, "lo", parts, -1L) ==
        Map(0 -> 4L, 1 -> 3L))
    } finally b.close()
  }

  test("fetchRange: exact [from, until) bound, lazily chunked") {
    val b = new EmbeddedKafkaBroker(numPartitions = 1)
    try {
      produce(b, "fr", 0, 0 until 20)
      // small maxBytes → several wire chunks inside one range
      val got = KafkaWire.fetchRange(b.host, b.port, "fr", 0,
        from = 3L, until = 17L, maxBytes = 64).toSeq
      assert(got.map(_.offset) == (3L until 17L))
      // until past the high watermark is a short read, not a hang
      assert(KafkaWire.fetchRange(b.host, b.port, "fr", 0, 18L, 99L)
        .toSeq.map(_.offset) == Seq(18L, 19L))
    } finally b.close()
  }

  test("batch read matches kafkaWireRead row for row") {
    val b = new EmbeddedKafkaBroker(numPartitions = 2)
    try {
      produce(b, "bt", 0, 0 until 6)
      produce(b, "bt", 1, 6 until 10)
      val dsv2 = spark.read.format("kafka-wire")
        .option("host", b.host).option("port", b.port.toString)
        .option("topic", "bt").load()
      assert(dsv2.columns.toSeq ==
        Seq("key", "value", "topic", "partition", "offset"))
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .selectExpr("cast(key as string)", "cast(value as string)",
          "topic", "partition", "offset")
        .as[(String, String, String, Int, Long)].collect().sortBy(_._1)
      assert(rows(dsv2).toSeq ==
        rows(Sources.kafkaWireRead(spark, b.host, b.port, "bt")).toSeq)
    } finally b.close()
  }

  test("streaming: checkpointed offsets — incremental batches, restart replays nothing") {
    val b = new EmbeddedKafkaBroker(numPartitions = 2)
    val root = java.nio.file.Files.createTempDirectory("graft_kws").toString
    try {
      produce(b, "st", 0, 0 until 5)
      produce(b, "st", 1, 100 until 105)
      def start() = spark.readStream.format("kafka-wire")
        .option("host", b.host).option("port", b.port.toString)
        .option("topic", "st").load()
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.ProcessingTime(50))
        .start()
      val q = start()
      q.processAllAvailable()
      assert(spark.read.parquet(s"$root/out").count() == 10L)
      // more records while running → picked up incrementally
      produce(b, "st", 0, 5 until 8)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$root/out").count() == 13L)
      q.stop()
      // records produced while STOPPED; the restart must resume from the
      // checkpoint — every old offset replayed zero times
      produce(b, "st", 1, 105 until 109)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val out = spark.read.parquet(s"$root/out")
      assert(out.count() == 17L)
      val keys = out.selectExpr("cast(key as string)").as[String].collect()
      assert(keys.length == keys.distinct.length, "a restart replayed offsets")
      assert(out.selectExpr("max(offset)").as[Long].head() == 8L)
    } finally b.close()
  }

  test("max_offsets_per_trigger bounds every micro-batch") {
    val b = new EmbeddedKafkaBroker(numPartitions = 2)
    try {
      produce(b, "bp", 0, 0 until 9)
      produce(b, "bp", 1, 100 until 112)
      val q = spark.readStream.format("kafka-wire")
        .option("host", b.host).option("port", b.port.toString)
        .option("topic", "bp")
        .option("max_offsets_per_trigger", "5").load()
        .writeStream.format("memory").queryName("kws_bp")
        .trigger(Trigger.ProcessingTime(20))
        .start()
      q.processAllAvailable()
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      q.stop()
      assert(spark.table("kws_bp").count() == 21L)
      // a caught-up stream drains 21 records in ceil-ish batches of ≤ 5
      // (+1 slack per partition from the progress floor)
      assert(sizes.length >= 4, s"sizes=${sizes.toSeq}")
      assert(sizes.forall(_ <= 7L), s"sizes=${sizes.toSeq}")
    } finally b.close()
  }

  test("starting_offsets=latest skips the backlog") {
    val b = new EmbeddedKafkaBroker(numPartitions = 1)
    try {
      produce(b, "sl", 0, 0 until 6) // backlog that must NOT appear
      val q = spark.readStream.format("kafka-wire")
        .option("host", b.host).option("port", b.port.toString)
        .option("topic", "sl")
        .option("starting_offsets", "latest").load()
        .writeStream.format("memory").queryName("kws_sl")
        .trigger(Trigger.ProcessingTime(20))
        .start()
      q.processAllAvailable()
      assert(spark.table("kws_sl").count() == 0L)
      produce(b, "sl", 0, 6 until 9)
      q.processAllAvailable()
      q.stop()
      assert(spark.table("kws_sl").selectExpr("cast(key as string)")
        .as[String].collect().sorted.toSeq == Seq("k6", "k7", "k8"))
    } finally b.close()
  }

  test("kafka_wire_stream_source section compiles to the streaming frame") {
    val b = new EmbeddedKafkaBroker(numPartitions = 1)
    try {
      produce(b, "sec", 0, 0 until 3)
      val spec = graft.plans.PipelineSpec.fromJson(
        s"""{"sections":[
          {"id":"src","name":"kafka_wire_stream_source","config":{
            "host":"${b.host}","port":"${b.port}","topic":"sec"}}],
          "edges":[]}""")
      val df = graft.plans.PipelineCompiler.compileFrame(spark, spec)
      assert(df.isStreaming)
      assert(df.columns.toSeq ==
        Seq("key", "value", "topic", "partition", "offset"))
    } finally b.close()
  }

  test("kafka_wire_stream_destination: a parquet stream lands on the broker, decodable") {
    val b = new EmbeddedKafkaBroker(numPartitions = 2)
    val root = java.nio.file.Files.createTempDirectory("graft_kwd").toString
    try {
      val rows = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      rows.toDF("id", "name").write.parquet(s"$root/in")
      val spec = graft.plans.PipelineSpec.fromJson(
        s"""{"sections":[
          {"id":"src","name":"stream_parquet_source","config":{"path":"$root/in"}},
          {"id":"k","name":"kafka_wire_stream_destination","config":{
            "host":"${b.host}","port":"${b.port}","topic":"dst",
            "checkpoint":"$root/ckpt"}}],
          "edges":[["src","k"]]}""")
      graft.plans.PipelineCompiler.run(spark, spec)
      val landed = Sources.kafkaDecode(
        Sources.kafkaWireRead(spark, b.host, b.port, "dst"),
        rows.toDF("id", "name").schema)
        .select("id", "name").as[(Long, String)].collect().sortBy(_._1)
      assert(landed.toSeq == rows)
      // AvailableNow drained and checkpointed: a second run replays nothing
      graft.plans.PipelineCompiler.run(spark, spec)
      assert(Sources.kafkaWireRead(spark, b.host, b.port, "dst").count() == 3L)
    } finally b.close()
  }

  test("missing required option fails loudly at planning, not mid-stream") {
    val e = intercept[Exception] {
      spark.readStream.format("kafka-wire")
        .option("host", "127.0.0.1").option("topic", "x").load()
    }
    assert(e.getMessage.contains("port"))
  }
}
