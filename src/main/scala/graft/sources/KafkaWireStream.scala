package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The kafka-wire path as a Spark DataSource V2 — the piece that makes
  * the pure-JDK [[KafkaWire]] client a REAL Structured Streaming source:
  * `spark.readStream.format("kafka-wire")` plans micro-batches from
  * ListOffsets watermarks, fetches on the executors (one task per topic
  * partition, same placement as [[Sources.kafkaWireRead]]), checkpoints
  * per-partition offsets through Spark's offset log, and honors
  * `max_offsets_per_trigger` backpressure via the engine's admission
  * control. `spark.read.format("kafka-wire")` gives the batch scan over
  * the same table.
  *
  * Why this exists: the reference's kafka connector is a stub
  * (`sections/kafka_connector/src/lib.rs:6-35`), Spark's own
  * `.format("kafka")` needs the external connector jar, and
  * [[KafkaWireCursor]] covers only the orchestrator's tick loop — this
  * closes the last gap, streaming reads in a bare-JDK environment with
  * exactly-once offset tracking supplied by the checkpoint rather than
  * the section [[graft.plans.StateStore]].
  *
  * Scale shape: planning traffic is O(#partitions) longs per trigger
  * (two ListOffsets RPCs); record bytes only ever move broker→executor,
  * bounded per pull by `max_bytes` ([[KafkaWire.fetchRange]] holds one
  * wire chunk at a time); and a lagging topic is drained in
  * `max_offsets_per_trigger`-sized batches so recovery after downtime
  * cannot balloon one micro-batch past executor memory.
  *
  * Options: `host`, `port`, `topic` (required); `starting_offsets` =
  * `earliest` (default) | `latest`; `max_offsets_per_trigger` (total
  * records per micro-batch, distributed over lagging partitions
  * proportionally to lag); `max_bytes` (per-fetch cap, default 4 MiB);
  * `dialect` = `auto` (default; one ApiVersions RPC picks v2 when the
  * broker serves it) | `v0` | `v2` ([[KafkaWire.Dialect]]).
  */
final class KafkaWireStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka-wire"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaWireStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KafkaWireTable(KafkaWireStream.Config.from(
      new CaseInsensitiveStringMap(properties)))
}

object KafkaWireStream {

  /** Same row shape as [[Sources.kafkaWireRead]], so batch and streaming
    * reads are drop-in interchangeable downstream. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false)))

  final case class Config(host: String, port: Int, topic: String,
                          startingOffsets: String,
                          maxOffsetsPerTrigger: Option[Long],
                          maxBytes: Int,
                          dialectName: String) {
    /** Resolved once per driver-side plan object (`auto` costs one
      * ApiVersions RPC); the concrete dialect then rides the
      * serialized [[KafkaWireInputPartition]]s so executors never
      * re-negotiate. */
    lazy val dialect: KafkaWire.Dialect =
      KafkaWire.dialectFor(dialectName, host, port)
  }

  object Config {
    def from(o: CaseInsensitiveStringMap): Config = {
      def req(k: String): String = {
        val v = o.get(k)
        require(v != null && v.nonEmpty, s"kafka-wire: option '$k' is required")
        v
      }
      val start = Option(o.get("starting_offsets")).getOrElse("earliest")
      require(start == "earliest" || start == "latest",
        s"kafka-wire: starting_offsets must be earliest|latest, got '$start'")
      val maxPer = Option(o.get("max_offsets_per_trigger")).map(_.toLong)
      maxPer.foreach(n => require(n > 0,
        s"kafka-wire: max_offsets_per_trigger must be positive, got $n"))
      val dialect = Option(o.get("dialect")).getOrElse("auto")
      require(Set("v0", "v2", "auto")(dialect),
        s"kafka-wire: dialect must be v0|v2|auto, got '$dialect'")
      Config(req("host"), req("port").toInt, req("topic"), start, maxPer,
        Option(o.get("max_bytes")).map(_.toInt).getOrElse(4 << 20), dialect)
    }
  }

  /** `{"0":12,"1":3}` — partition → next offset to read. Hand-rolled
    * because the shape is fixed (int keys, long values) and the offset
    * log must stay stable across Spark versions. */
  private[sources] def renderOffsets(offsets: Map[Int, Long]): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")

  private[sources] def parseOffsets(json: String): Map[Int, Long] = {
    val t = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (t.isEmpty) Map.empty
    else t.split(",").map { kv =>
      kv.split(":") match {
        case Array(k, v) =>
          k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
        case _ => throw new IllegalArgumentException(
          s"kafka-wire: malformed offset entry '$kv' in '$json'")
      }
    }.toMap
  }

  /** Cap this trigger's advance at `max` total records, distributed over
    * lagging partitions proportionally to their lag. Every lagging
    * partition advances by AT LEAST one record — strict proportionality
    * would floor a quiet partition's share to zero forever behind a hot
    * one (so a batch may slightly exceed `max` when #partitions is large
    * relative to it; bounded by #partitions extra records). */
  private[sources] def capAdvance(from: Map[Int, Long], hw: Map[Int, Long],
                                  max: Long): Map[Int, Long] = {
    val lag = hw.map { case (p, h) => p -> math.max(0L, h - from.getOrElse(p, 0L)) }
    val total = lag.values.sum
    if (total <= max) hw
    else hw.map { case (p, h) =>
      val l = lag(p)
      // proportional share in double space: `l * max` in Long overflows
      // once lag × cap passes 2^63 (a weeks-behind topic with a large
      // trigger cap), yielding a negative take and a REGRESSING end
      // offset; the double's ~2^53 mantissa loses at worst a handful of
      // records off the share, which the next trigger picks up
      val take = if (l == 0L) 0L
        else math.max(1L, (l.toDouble * max.toDouble / total.toDouble).toLong)
      p -> math.min(h, from.getOrElse(p, 0L) + take)
    }
  }
}

final class KafkaWireTable(cfg: KafkaWireStream.Config)
  extends Table with SupportsRead {
  override def name(): String =
    s"kafka-wire:${cfg.topic}@${cfg.host}:${cfg.port}"
  override def schema(): StructType = KafkaWireStream.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KafkaWireScan(cfg)
}

final class KafkaWireScan(cfg: KafkaWireStream.Config)
  extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = KafkaWireStream.schema
  override def description(): String =
    s"kafka-wire ${cfg.topic}@${cfg.host}:${cfg.port}"
  override def toBatch: Batch = new KafkaWireBatch(cfg)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaWireMicroBatchStream(cfg)
}

/** Batch scan: earliest → high watermark at planning time, one input
  * partition per topic partition. */
final class KafkaWireBatch(cfg: KafkaWireStream.Config) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val d = cfg.dialect
    val parts = KafkaWire.partitions(cfg.host, cfg.port, cfg.topic, d)
    val lo = KafkaWire.offsetsAt(cfg.host, cfg.port, cfg.topic, parts, -2L, d)
    val hi = KafkaWire.offsetsAt(cfg.host, cfg.port, cfg.topic, parts, -1L, d)
    parts.flatMap { p =>
      if (hi(p) > lo(p))
        Some(KafkaWireInputPartition(cfg.host, cfg.port, cfg.topic, p,
          lo(p), hi(p), cfg.maxBytes, d): InputPartition)
      else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaWireReaderFactory
}

final case class KafkaWireOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String = KafkaWireStream.renderOffsets(offsets)
}

final class KafkaWireMicroBatchStream(cfg: KafkaWireStream.Config)
  extends MicroBatchStream with SupportsAdmissionControl {

  // partition ids are stable for a topic; one Metadata RPC per stream
  private lazy val partIds: Seq[Int] =
    KafkaWire.partitions(cfg.host, cfg.port, cfg.topic, cfg.dialect)

  private def at(ts: Long): Map[Int, Long] =
    KafkaWire.offsetsAt(cfg.host, cfg.port, cfg.topic, partIds, ts, cfg.dialect)

  override def initialOffset(): Offset =
    KafkaWireOffset(at(if (cfg.startingOffsets == "latest") -1L else -2L))

  override def getDefaultReadLimit: ReadLimit =
    cfg.maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  // the engine calls the admission-control overload; the legacy arity
  // would silently ignore the read limit, so refuse it
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "kafka-wire uses latestOffset(start, readLimit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[KafkaWireOffset].offsets
    val hw = at(-1L)
    KafkaWireOffset(limit match {
      case r: ReadMaxRows => KafkaWireStream.capAdvance(from, hw, r.maxRows())
      case _ => hw
    })
  }

  override def reportLatestOffset(): Offset = KafkaWireOffset(at(-1L))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[KafkaWireOffset].offsets
    val b = end.asInstanceOf[KafkaWireOffset].offsets
    b.keys.toSeq.sorted.flatMap { p =>
      val from = a.getOrElse(p, 0L)
      if (b(p) > from)
        Some(KafkaWireInputPartition(cfg.host, cfg.port, cfg.topic, p,
          from, b(p), cfg.maxBytes, cfg.dialect): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaWireReaderFactory

  override def deserializeOffset(json: String): Offset =
    KafkaWireOffset(KafkaWireStream.parseOffsets(json))

  // the broker retains the log; the checkpoint IS the commit record
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class KafkaWireInputPartition(host: String, port: Int, topic: String,
                                         partition: Int, from: Long, until: Long,
                                         maxBytes: Int,
                                         dialect: KafkaWire.Dialect) extends InputPartition

/** Executor-side reader: sockets open where the data lands, streaming
  * through [[KafkaWire.fetchRange]] one wire chunk at a time. */
final class KafkaWireReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ip = p.asInstanceOf[KafkaWireInputPartition]
    new PartitionReader[InternalRow] {
      private val it = KafkaWire.fetchRange(ip.host, ip.port, ip.topic,
        ip.partition, ip.from, ip.until, ip.maxBytes, ip.dialect)
      private var cur: KafkaWire.Record = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = InternalRow(
        cur.key, cur.value, UTF8String.fromString(ip.topic),
        ip.partition, cur.offset)
      override def close(): Unit = ()
    }
  }
}
