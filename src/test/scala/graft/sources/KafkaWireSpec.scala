package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The kafka path END TO END over real sockets, in BOTH wire dialects:
  * [[EmbeddedKafkaBroker]] speaks either the legacy v0 generation or
  * the post-KIP-896 v2 generation (Metadata v4 / ListOffsets v1 /
  * Produce v3 / Fetch v4, magic-2 record batches), the same subsets
  * [[KafkaWire]] emits — so produce → fetch round-trips through an
  * actual wire on each dialect, and the round-trip must agree
  * byte-for-byte with the oracle-verified `op_kafka_encode`/
  * `op_kafka_decode` frame shape. */
class KafkaWireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dialects = Seq("v0" -> KafkaWire.V0, "v2" -> KafkaWire.V2)

  dialects.foreach { case (name, d) =>
    test(s"[$name] client round-trip: produce then fetch returns the records in order") {
      val broker = new EmbeddedKafkaBroker(numPartitions = 2, dialect = name)
      try {
        val recs = (0 until 10).map(i =>
          (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8")))
        val base = KafkaWire.produce(broker.host, broker.port, "t1", 0, recs, d)
        assert(base == 0L)
        // second batch appends after the first
        assert(KafkaWire.produce(broker.host, broker.port, "t1", 0,
          Seq(("late".getBytes, "x".getBytes)), d) == 10L)
        val got = KafkaWire.fetchAll(broker.host, broker.port, "t1", 0, dialect = d)
        assert(got.map(_.offset) == (0L to 10L))
        assert(got.take(10).map(r => new String(r.key, "UTF-8")) ==
          (0 until 10).map(i => s"k$i"))
        assert(got.take(10).map(r => new String(r.value, "UTF-8")) ==
          (0 until 10).map(i => s"v$i"))
        // offset-resumed fetch — for v2 the offset lands MID-BATCH, so
        // the broker returns the whole containing batch and the client
        // must drop the records below the requested offset
        val tail = KafkaWire.fetchAll(broker.host, broker.port, "t1", 0,
          offset = 9, dialect = d)
        assert(tail.map(_.offset) == Seq(9L, 10L))
      } finally broker.close()
    }

    test(s"[$name] truncated fetch (small maxBytes) resumes mid-log without loss or dupes") {
      val broker = new EmbeddedKafkaBroker(numPartitions = 1, dialect = name)
      try {
        // one record per produce = one wire entry per offset; the budget
        // fits one entry (the ~117-byte v2 batch included) but not two,
        // so every fetch returns a CUT set and the client must resume
        (0 until 50).foreach { i =>
          KafkaWire.produce(broker.host, broker.port, "t2", 0, Seq(
            (s"key-$i".getBytes("UTF-8"), ("payload-" * 5 + i).getBytes("UTF-8"))), d)
        }
        val got = KafkaWire.fetchAll(broker.host, broker.port, "t2", 0,
          maxBytes = 150, dialect = d)
        assert(got.map(_.offset) == (0L until 50L))
        assert(got.map(r => new String(r.key, "UTF-8")) ==
          (0 until 50).map(i => s"key-$i"))
      } finally broker.close()
    }

    test(s"[$name] an entry larger than maxBytes raises record-too-large, never truncates silently") {
      val broker = new EmbeddedKafkaBroker(numPartitions = 1, dialect = name)
      try {
        Seq(
          Seq(("k0".getBytes, "small".getBytes)),
          Seq(("k1".getBytes, Array.fill[Byte](500)(7))), // exceeds maxBytes below
          Seq(("k2".getBytes, "after".getBytes))
        ).foreach(r => KafkaWire.produce(broker.host, broker.port, "big", 0, r, d))
        val e = intercept[IllegalStateException] {
          KafkaWire.fetchAll(broker.host, broker.port, "big", 0,
            maxBytes = 100, dialect = d)
        }
        assert(e.getMessage.contains("exceeds maxBytes"), e.getMessage)
        // with enough budget the same log reads completely
        assert(KafkaWire.fetchAll(broker.host, broker.port, "big", 0,
          dialect = d).size == 3)
      } finally broker.close()
    }

    test(s"[$name] null keys survive the wire") {
      val broker = new EmbeddedKafkaBroker(numPartitions = 1, dialect = name)
      try {
        KafkaWire.produce(broker.host, broker.port, "t3", 0,
          Seq((null, "unkeyed".getBytes("UTF-8"))), d)
        val got = KafkaWire.fetchAll(broker.host, broker.port, "t3", 0, dialect = d)
        assert(got.size == 1 && got.head.key == null)
        assert(new String(got.head.value, "UTF-8") == "unkeyed")
      } finally broker.close()
    }

    test(s"[$name] Spark e2e: kafkaEncode -> wire produce -> wire read -> kafkaDecode round-trips") {
      val broker = new EmbeddedKafkaBroker(numPartitions = 2, dialect = name)
      try {
        val rows = Seq(("orders", 1L, "widget"), ("orders", 2L, "gadget"),
          ("users", 3L, "ada"), ("users", 4L, "grace"), ("orders", 5L, "gizmo"))
          .toDF("origin", "id", "name")
        // SINK half: the oracle-verified encode shape over the real socket
        Sinks.kafkaWireWrite(Sinks.kafkaEncode(rows), broker.host, broker.port,
          "events", d)
        // SOURCE half: one Spark task per partition fetches over its own
        // socket; the frame is connector-shaped (key/value/topic/partition/
        // offset), so the oracle-verified decode applies unchanged
        val read = Sources.kafkaWireRead(spark, broker.host, broker.port,
          "events", dialect = d)
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

    test(s"[$name] incremental cursor: slices advance per partition, crash replays exactly one slice") {
      val broker = new EmbeddedKafkaBroker(numPartitions = 2, dialect = name)
      try {
        val store = new graft.plans.StateStore(
          java.nio.file.Files.createTempDirectory("kwc_state").toString)
        def produceN(tag: String, n: Int): Unit =
          (0 until n).foreach { i =>
            KafkaWire.produce(broker.host, broker.port, "inc", i % 2,
              Seq((s"$tag$i".getBytes, s"v$tag$i".getBytes)), d)
          }
        var seen = Seq.empty[String]
        val sink: org.apache.spark.sql.DataFrame => Unit = df =>
          seen ++= df.select(col("key").cast("string")).as[String].collect().sorted
        produceN("a", 4)
        assert(KafkaWireCursor.tick(spark, store, "p", "s",
          broker.host, broker.port, "inc", d)(sink) == 4)
        assert(seen.size == 4)
        // caught up: no rows, state untouched
        assert(KafkaWireCursor.tick(spark, store, "p", "s",
          broker.host, broker.port, "inc", d)(sink) == 0)
        // new records: ONLY they flow — both partitions' offsets advanced
        produceN("b", 3)
        assert(KafkaWireCursor.tick(spark, store, "p", "s",
          broker.host, broker.port, "inc", d)(sink) == 3)
        assert(seen.count(_.startsWith("a")) == 4 &&
          seen.count(_.startsWith("b")) == 3)
        // crash BETWEEN sink and state write: a failing sink leaves the
        // offsets unadvanced, so the retry re-delivers the same slice —
        // at-least-once, never a lost slice
        produceN("c", 2)
        intercept[RuntimeException] {
          KafkaWireCursor.tick(spark, store, "p", "s",
            broker.host, broker.port, "inc", d)(_ => sys.error("sink died"))
        }
        assert(KafkaWireCursor.tick(spark, store, "p", "s",
          broker.host, broker.port, "inc", d)(sink) == 2)
        assert(seen.count(_.startsWith("c")) == 2)
      } finally broker.close()
    }
  }

  test("cursor slices are snapshot-bounded: records produced mid-tick wait for the next tick") {
    // the ADVICE finding: an unbounded read-to-watermark re-fetched on
    // recompute could swallow post-sink records into "done" state. The
    // bounded read makes the slice a pure function of (from, until) —
    // verified here by producing DURING the sink and asserting the late
    // record is delivered by the NEXT tick, not silently skipped.
    val broker = new EmbeddedKafkaBroker(numPartitions = 1)
    try {
      val store = new graft.plans.StateStore(
        java.nio.file.Files.createTempDirectory("kwc_snap").toString)
      KafkaWire.produce(broker.host, broker.port, "snap", 0,
        Seq(("a".getBytes, "1".getBytes)))
      var keys = Seq.empty[String]
      val n1 = KafkaWireCursor.tick(spark, store, "p", "s",
        broker.host, broker.port, "snap") { df =>
        // a record lands while the sink is running — AFTER the snapshot
        KafkaWire.produce(broker.host, broker.port, "snap", 0,
          Seq(("b".getBytes, "2".getBytes)))
        keys ++= df.select(col("key").cast("string")).as[String].collect()
      }
      assert(n1 == 1 && keys == Seq("a"))
      // the late record was NOT folded into the advanced state: the next
      // tick delivers it
      val n2 = KafkaWireCursor.tick(spark, store, "p", "s",
        broker.host, broker.port, "snap") { df =>
        keys ++= df.select(col("key").cast("string")).as[String].collect()
      }
      assert(n2 == 1 && keys == Seq("a", "b"))
    } finally broker.close()
  }

  test("v2 record-batch codec round-trips, including null keys and empty values") {
    val recs = Seq[(Array[Byte], Array[Byte])](
      ("k".getBytes, "v".getBytes), (null, "unkeyed".getBytes),
      ("empty".getBytes, Array.empty[Byte]))
    val batch = KafkaWire.recordBatchV2(recs)
    assert(batch(16) == 2, "magic byte at entry offset 16")
    val got = KafkaWire.readRecordSet(batch, 3)
    assert(got.map(_.offset) == Seq(0L, 1L, 2L))
    assert(got.forall(_.partition == 3))
    assert(new String(got(0).key) == "k" && new String(got(0).value) == "v")
    assert(got(1).key == null && new String(got(1).value) == "unkeyed")
    assert(got(2).value.isEmpty)
  }

  private val codecs = Seq(1 -> "gzip", 2 -> "snappy", 3 -> "lz4", 4 -> "zstd")

  test("compressed v2 batches (gzip/snappy/lz4/zstd) round-trip, shrink, and survive the wire") {
    // codec level: repetitive payloads must actually shrink, and decode
    // bit-identically — null keys and empty values included
    val recs = Seq[(Array[Byte], Array[Byte])](
      ("k".getBytes, ("payload-" * 40).getBytes), (null, "unkeyed".getBytes),
      ("empty".getBytes, Array.empty[Byte])) ++
      (0 until 20).map(i => (s"k$i".getBytes, ("text " * 30 + i).getBytes))
    val plain = KafkaWire.recordBatchV2(recs)
    codecs.foreach { case (codec, name) =>
      val comp = KafkaWire.recordBatchV2(recs, codec = codec)
      assert(comp.length < plain.length / 2,
        s"$name must compress the repetitive batch: ${comp.length} vs ${plain.length}")
      assert((java.nio.ByteBuffer.wrap(comp).getShort(21) & 0x07) == codec,
        s"attributes codec bits must say $name")
      val got = KafkaWire.readRecordSet(comp, 7)
      assert(got.map(_.offset) == (0L until recs.size.toLong), name)
      assert(got.head.partition == 7 &&
        new String(got.head.value) == "payload-" * 40, name)
      assert(got(1).key == null && got(2).value.isEmpty, name)
    }

    // wire level: every codec's produce fetches back through a real
    // socket (the broker stores and serves the batch verbatim)
    val broker = new EmbeddedKafkaBroker(numPartitions = 1, dialect = "v2")
    try codecs.foreach { case (codec, name) =>
      val wire = (0 until 10).map(i =>
        (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8")))
      KafkaWire.produce(broker.host, broker.port, s"c$name", 0, wire,
        KafkaWire.V2, codec = codec)
      val fetched = KafkaWire.fetchAll(broker.host, broker.port, s"c$name", 0,
        dialect = KafkaWire.V2)
      assert(fetched.map(r => new String(r.key, "UTF-8")) ==
        (0 until 10).map(i => s"k$i"), name)
      assert(fetched.map(_.offset) == (0L until 10L), name)
    } finally broker.close()
  }

  test("compressed batch inflating past the decompression bound fails loudly") {
    // a 1 MB all-zeros value gzips to ~1 KB — exactly the bomb shape; a
    // 64 KB bound must refuse it BEFORE buffering the inflated bytes,
    // while a roomy bound decodes it fine
    val bomb = KafkaWire.recordBatchV2(
      Seq(("k".getBytes, new Array[Byte](1 << 20))), codec = 1)
    assert(bomb.length < 64 * 1024, s"fixture must be small: ${bomb.length}")
    val ex = intercept[IllegalArgumentException] {
      KafkaWire.readRecordSet(bomb, 0, maxDecompressedBatchBytes = 64L * 1024)
    }
    assert(ex.getMessage.contains("inflates past"), ex.getMessage)
    val ok = KafkaWire.readRecordSet(bomb, 0,
      maxDecompressedBatchBytes = 4L << 20)
    assert(ok.size == 1 && ok.head.value.length == (1 << 20))
  }

  test("a gzip-compressed log decodes through the DSv2 streaming path") {
    val broker = new EmbeddedKafkaBroker(numPartitions = 1, dialect = "v2")
    val root = java.nio.file.Files.createTempDirectory("graft_kwgz").toString
    try {
      val wire = (0 until 10).map(i =>
        (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8")))
      KafkaWire.produce(broker.host, broker.port, "gz", 0, wire,
        KafkaWire.V2, codec = 1)
      val q = spark.readStream.format("kafka-wire")
        .option("host", broker.host).option("port", broker.port.toString)
        .option("topic", "gz").load()
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = spark.read.parquet(s"$root/out")
        .select(col("key").cast("string")).as[String].collect().sorted
      assert(out.toSeq == (0 until 10).map(i => s"k$i").sorted)
    } finally broker.close()
  }

  test("undefined codec bits fail loudly by number, not as corruption") {
    // craft a codec-5 batch: take a plain batch, patch the attributes
    // codec bits, re-sign the CRC32C (it covers attributes..end)
    val batch = KafkaWire.recordBatchV2(Seq(("k".getBytes, "v".getBytes)))
    val bb = java.nio.ByteBuffer.wrap(batch)
    bb.putShort(21, (bb.getShort(21) | 0x05).toShort)
    val crc = new java.util.zip.CRC32C()
    crc.update(batch, 21, batch.length - 21)
    bb.putInt(17, crc.getValue.toInt)
    val e = intercept[IllegalArgumentException] {
      KafkaWire.readRecordSet(batch, 0)
    }
    assert(e.getMessage.contains("codec 5"), e.getMessage)
    // the legacy dialect cannot carry compression — refused at produce
    val e2 = intercept[IllegalArgumentException] {
      KafkaWire.produce("localhost", 1, "t", 0,
        Seq(("k".getBytes, "v".getBytes)), KafkaWire.V0, codec = 1)
    }
    assert(e2.getMessage.contains("v2"), e2.getMessage)
  }

  test("v2 batches with corrupted payload bytes fail the CRC32C check loudly") {
    val batch = KafkaWire.recordBatchV2(Seq(("k".getBytes, "v".getBytes)))
    batch(batch.length - 1) = (batch(batch.length - 1) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      KafkaWire.readRecordSet(batch, 0)
    }
    assert(e.getMessage.contains("CRC32C"), e.getMessage)
    // ...but a corrupted baseOffset does NOT break the checksum: that
    // field sits outside it, which is what lets brokers rewrite it
    val b2 = KafkaWire.recordBatchV2(Seq(("k".getBytes, "v".getBytes)))
    java.nio.ByteBuffer.wrap(b2).putLong(0, 42L)
    assert(KafkaWire.readRecordSet(b2, 0).map(_.offset) == Seq(42L))
  }

  test("detectDialect negotiates v0 vs v2 from the broker's ApiVersions") {
    val legacy = new EmbeddedKafkaBroker(1, dialect = "v0")
    val modern = new EmbeddedKafkaBroker(1, dialect = "v2")
    try {
      assert(KafkaWire.detectDialect(legacy.host, legacy.port) == KafkaWire.V0)
      assert(KafkaWire.detectDialect(modern.host, modern.port) == KafkaWire.V2)
      // a v2-only broker REFUSES v0 requests (as Kafka 4.x does) rather
      // than silently serving them
      intercept[Exception] {
        KafkaWire.produce(modern.host, modern.port, "t", 0,
          Seq(("k".getBytes, "v".getBytes)), KafkaWire.V0)
      }
    } finally { legacy.close(); modern.close() }
  }

  test("kafka_wire sections drive the round-trip from JSON specs, auto-negotiating the dialect") {
    // same spec JSON against a legacy and a modern broker: the section's
    // default dialect=auto negotiates per broker, nothing else changes
    Seq("v0", "v2").foreach { mode =>
      val broker = new EmbeddedKafkaBroker(numPartitions = 2, dialect = mode)
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
        assert(out.count() == 2, s"mode $mode")
        assert(out.select(col("key").cast("string")).as[String].collect().toSet ==
          Set("t_a", "t_b"), s"mode $mode")
      } finally broker.close()
    }
  }
}
