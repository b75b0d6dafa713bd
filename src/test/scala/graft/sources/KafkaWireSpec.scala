package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The kafka path END TO END over real sockets: [[EmbeddedKafkaBroker]]
  * speaks the same Metadata/Produce/Fetch v0 dialect as [[KafkaWire]],
  * so produce → fetch round-trips through an actual wire — and the
  * round-trip must agree byte-for-byte with the oracle-verified
  * `op_kafka_encode`/`op_kafka_decode` frame shape. */
class KafkaWireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("client round-trip: produce then fetch returns the records in order") {
    val broker = new EmbeddedKafkaBroker(numPartitions = 2)
    try {
      val recs = (0 until 10).map(i =>
        (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8")))
      val base = KafkaWire.produce(broker.host, broker.port, "t1", 0, recs)
      assert(base == 0L)
      // second batch appends after the first
      assert(KafkaWire.produce(broker.host, broker.port, "t1", 0,
        Seq(("late".getBytes, "x".getBytes))) == 10L)
      val got = KafkaWire.fetchAll(broker.host, broker.port, "t1", 0)
      assert(got.map(_.offset) == (0L to 10L))
      assert(got.take(10).map(r => new String(r.key, "UTF-8")) ==
        (0 until 10).map(i => s"k$i"))
      assert(got.take(10).map(r => new String(r.value, "UTF-8")) ==
        (0 until 10).map(i => s"v$i"))
      // offset-resumed fetch
      val tail = KafkaWire.fetchAll(broker.host, broker.port, "t1", 0, offset = 9)
      assert(tail.map(_.offset) == Seq(9L, 10L))
    } finally broker.close()
  }

  test("truncated fetch (small maxBytes) resumes mid-log without loss or dupes") {
    val broker = new EmbeddedKafkaBroker(numPartitions = 1)
    try {
      val recs = (0 until 50).map(i =>
        (s"key-$i".getBytes("UTF-8"), ("payload-" * 5 + i).getBytes("UTF-8")))
      KafkaWire.produce(broker.host, broker.port, "t2", 0, recs)
      // maxBytes small enough that each fetch returns a CUT message set
      val got = KafkaWire.fetchAll(broker.host, broker.port, "t2", 0,
        maxBytes = 100)
      assert(got.map(_.offset) == (0L until 50L))
      assert(got.map(r => new String(r.key, "UTF-8")) ==
        (0 until 50).map(i => s"key-$i"))
    } finally broker.close()
  }

  test("a message larger than maxBytes raises record-too-large, never truncates silently") {
    val broker = new EmbeddedKafkaBroker(numPartitions = 1)
    try {
      KafkaWire.produce(broker.host, broker.port, "big", 0, Seq(
        ("k0".getBytes, "small".getBytes),
        ("k1".getBytes, Array.fill[Byte](500)(7)), // exceeds maxBytes below
        ("k2".getBytes, "after".getBytes)))
      val e = intercept[IllegalStateException] {
        KafkaWire.fetchAll(broker.host, broker.port, "big", 0, maxBytes = 100)
      }
      assert(e.getMessage.contains("exceeds maxBytes"), e.getMessage)
      // with enough budget the same log reads completely
      assert(KafkaWire.fetchAll(broker.host, broker.port, "big", 0).size == 3)
    } finally broker.close()
  }

  test("null keys survive the wire") {
    val broker = new EmbeddedKafkaBroker(numPartitions = 1)
    try {
      KafkaWire.produce(broker.host, broker.port, "t3", 0,
        Seq((null, "unkeyed".getBytes("UTF-8"))))
      val got = KafkaWire.fetchAll(broker.host, broker.port, "t3", 0)
      assert(got.size == 1 && got.head.key == null)
      assert(new String(got.head.value, "UTF-8") == "unkeyed")
    } finally broker.close()
  }

  test("Spark e2e: kafkaEncode -> wire produce -> wire read -> kafkaDecode round-trips") {
    val broker = new EmbeddedKafkaBroker(numPartitions = 2)
    try {
      val rows = Seq(("orders", 1L, "widget"), ("orders", 2L, "gadget"),
        ("users", 3L, "ada"), ("users", 4L, "grace"), ("orders", 5L, "gizmo"))
        .toDF("origin", "id", "name")
      // SINK half: the oracle-verified encode shape over the real socket
      Sinks.kafkaWireWrite(Sinks.kafkaEncode(rows), broker.host, broker.port,
        "events")
      // SOURCE half: one Spark task per partition fetches over its own
      // socket; the frame is connector-shaped (key/value/topic/partition/
      // offset), so the oracle-verified decode applies unchanged
      val read = Sources.kafkaWireRead(spark, broker.host, broker.port, "events")
      assert(read.columns.toSeq ==
        Seq("key", "value", "topic", "partition", "offset"))
      assert(read.select("partition").distinct().count() == 2,
        "key-hash routing must use both partitions")
      val decoded = Sources.kafkaDecode(read,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("name",
            org.apache.spark.sql.types.StringType))))
      val got = decoded.select("origin", "id", "name")
        .as[(String, Long, String)].collect().toSet
      assert(got == Set(("orders", 1L, "widget"), ("orders", 2L, "gadget"),
        ("users", 3L, "ada"), ("users", 4L, "grace"), ("orders", 5L, "gizmo")))
      // same-key records stay in ONE partition (ordering contract)
      val perKey = read.select(col("key").cast("string"), col("partition"))
        .distinct().as[(String, Int)].collect()
        .groupBy(_._1).view.mapValues(_.length)
      assert(perKey.forall(_._2 == 1), s"key split across partitions: $perKey")
    } finally broker.close()
  }

  test("incremental cursor: slices advance per partition, crash replays exactly one slice") {
    val broker = new EmbeddedKafkaBroker(numPartitions = 2)
    try {
      val store = new graft.plans.StateStore(
        java.nio.file.Files.createTempDirectory("kwc_state").toString)
      def produceN(tag: String, n: Int): Unit =
        (0 until n).foreach { i =>
          KafkaWire.produce(broker.host, broker.port, "inc", i % 2,
            Seq((s"$tag$i".getBytes, s"v$tag$i".getBytes)))
        }
      var seen = Seq.empty[String]
      val sink: org.apache.spark.sql.DataFrame => Unit = df =>
        seen ++= df.select(col("key").cast("string")).as[String].collect().sorted
      produceN("a", 4)
      assert(KafkaWireCursor.tick(spark, store, "p", "s",
        broker.host, broker.port, "inc")(sink) == 4)
      assert(seen.size == 4)
      // caught up: no rows, state untouched
      assert(KafkaWireCursor.tick(spark, store, "p", "s",
        broker.host, broker.port, "inc")(sink) == 0)
      // new records: ONLY they flow — both partitions' offsets advanced
      produceN("b", 3)
      assert(KafkaWireCursor.tick(spark, store, "p", "s",
        broker.host, broker.port, "inc")(sink) == 3)
      assert(seen.count(_.startsWith("a")) == 4 &&
        seen.count(_.startsWith("b")) == 3)
      // crash BETWEEN sink and state write: a failing sink leaves the
      // offsets unadvanced, so the retry re-delivers the same slice —
      // at-least-once, never a lost slice
      produceN("c", 2)
      intercept[RuntimeException] {
        KafkaWireCursor.tick(spark, store, "p", "s",
          broker.host, broker.port, "inc")(_ => sys.error("sink died"))
      }
      assert(KafkaWireCursor.tick(spark, store, "p", "s",
        broker.host, broker.port, "inc")(sink) == 2)
      assert(seen.count(_.startsWith("c")) == 2)
    } finally broker.close()
  }

  test("kafka_wire sections drive the round-trip from JSON specs") {
    val broker = new EmbeddedKafkaBroker(numPartitions = 2)
    try {
      val tmp = java.nio.file.Files.createTempDirectory("kwire").toString
      Seq(("t_a", 10L), ("t_b", 20L)).toDF("origin", "v")
        .write.parquet(s"$tmp/in")
      val push = s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$tmp/in"}},
        {"id":"k","name":"kafka_wire_destination","config":{
          "host":"${broker.host}","port":"${broker.port}","topic":"spec_t"}}],
        "edges":[["src","k"]]}"""
      graft.plans.PipelineCompiler.run(spark,
        graft.plans.PipelineSpec.fromJson(push))
      val pull = s"""{"sections":[
        {"id":"k","name":"kafka_wire_source","config":{
          "host":"${broker.host}","port":"${broker.port}","topic":"spec_t"}}],
        "edges":[]}"""
      val out = graft.plans.PipelineCompiler.compileFrame(spark,
        graft.plans.PipelineSpec.fromJson(pull))
      assert(out.count() == 2)
      assert(out.select(col("key").cast("string")).as[String].collect().toSet ==
        Set("t_a", "t_b"))
    } finally broker.close()
  }
}
