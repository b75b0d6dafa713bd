package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.util.zip.CRC32

/** A minimal Kafka WIRE-PROTOCOL client in pure JDK — no kafka jars.
  *
  * Speaks the v0 generation of the public protocol (KIP-35 era):
  * Metadata (api 3), Produce (api 0), Fetch (api 1) and ListOffsets
  * (api 2), with v0 message sets (`offset INT64, size INT32, crc INT32, magic 0, attributes 0,
  * key BYTES, value BYTES`; CRC32 over everything after the crc field).
  * v0 is the simplest self-contained dialect every broker still accepts,
  * and it is all a batch source/sink pair needs: list partitions,
  * append records, read a partition from an offset.
  *
  * Why this exists: the reference's kafka connector is a stub
  * (`sections/kafka_connector/src/lib.rs:6-35` is `unimplemented!()`),
  * and Spark's `.format("kafka")` needs the external connector jar.
  * This client makes the kafka path REAL end-to-end in a bare JDK
  * environment: [[Sources.kafkaWireRead]] fetches one Spark task per
  * partition, [[Sinks.kafkaWireWrite]] produces per task — the socket
  * IO happens ON THE EXECUTORS, exactly where a connector would do it.
  * Deployments with the connector jar should still prefer
  * `.format("kafka")` ([[Sources.kafka]]) for streaming reads, offset
  * management and SASL/TLS; this is the dependency-free batch path.
  *
  * Every call opens one short-lived connection: correct (the protocol
  * is request/response over any connection) and plenty for batch jobs —
  * connection pooling is a throughput refinement the tests don't need.
  */
object KafkaWire {

  final case class Record(partition: Int, offset: Long,
                          key: Array[Byte], value: Array[Byte])

  /** Partition ids of `topic` (Metadata v0). */
  def partitions(host: String, port: Int, topic: String): Seq[Int] = {
    val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
    o.writeInt(1); writeString(o, topic)
    val resp = rpc(host, port, apiKey = 3, body.toByteArray)
    val b = ByteBuffer.wrap(resp)
    val nBrokers = b.getInt
    (0 until nBrokers).foreach { _ => b.getInt; skipString(b); b.getInt }
    val nTopics = b.getInt
    var out = Seq.empty[Int]
    (0 until nTopics).foreach { _ =>
      val err = b.getShort; val name = readString(b)
      val nParts = b.getInt
      val ids = (0 until nParts).map { _ =>
        val pErr = b.getShort; val pid = b.getInt; val leader = b.getInt
        skipIntArray(b); skipIntArray(b)
        require(pErr == 0, s"partition $pid of $name: error $pErr (leader $leader)")
        pid
      }
      if (name == topic) {
        require(err == 0, s"metadata error $err for topic $topic")
        out = ids.sorted
      }
    }
    require(out.nonEmpty, s"topic $topic has no partitions")
    out
  }

  /** Per-partition offsets of `topic` at a protocol timestamp
    * (ListOffsets v0, api 2): `-1` = latest (the high watermark), `-2` =
    * earliest (the log start). One RPC covers all partitions — this is
    * how a micro-batch planner asks "where does the next batch end"
    * without fetching a single record. */
  def offsetsAt(host: String, port: Int, topic: String,
                parts: Seq[Int], timestamp: Long): Map[Int, Long] = {
    require(timestamp == -1L || timestamp == -2L,
      s"ListOffsets v0 takes -1 (latest) or -2 (earliest), got $timestamp")
    require(parts.nonEmpty, "offsetsAt needs at least one partition")
    val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
    o.writeInt(-1) // replica_id: consumer
    o.writeInt(1); writeString(o, topic)
    o.writeInt(parts.size)
    parts.foreach { p => o.writeInt(p); o.writeLong(timestamp); o.writeInt(1) }
    val resp = rpc(host, port, apiKey = 2, body.toByteArray)
    val b = ByteBuffer.wrap(resp)
    val nTopics = b.getInt; require(nTopics == 1, s"listOffsets: $nTopics topics")
    skipString(b)
    val nParts = b.getInt
    (0 until nParts).map { _ =>
      val pid = b.getInt; val err = b.getShort
      val nOff = b.getInt
      val offs = (0 until nOff).map(_ => b.getLong)
      require(err == 0, s"listOffsets $topic/$pid: error $err")
      require(offs.nonEmpty, s"listOffsets $topic/$pid: empty offset list")
      pid -> offs.head
    }.toMap
  }

  /** Lazily read `topic/partition` over `[from, until)` — the BOUNDED
    * form of [[fetchAll]] a micro-batch task needs: each pull holds at
    * most one `maxBytes` wire chunk, and records at or past `until`
    * (produced after the batch was planned) are excluded so the batch
    * boundary is exact. Stops early without error if the log ends below
    * `until` (a planner race with retention-truncation surfaces as a
    * short read, not a hang). */
  def fetchRange(host: String, port: Int, topic: String, partition: Int,
                 from: Long, until: Long,
                 maxBytes: Int = 4 << 20): Iterator[Record] = {
    val part = partition // Iterator.partition shadows the param below
    new Iterator[Record] {
      private var at = from
      private var buf: Iterator[Record] = Iterator.empty
      private def pull(): Unit =
        while (!buf.hasNext && at < until) {
          val (records, hw) = fetchOnce(host, port, topic, part, at, maxBytes)
          if (records.isEmpty) {
            // same record-too-large policy as fetchAll: empty below the
            // watermark means one message exceeds maxBytes — loud, never
            // a silently truncated batch
            if (at < math.min(until, hw)) throw new IllegalStateException(
              s"$topic/$part: message at offset $at exceeds maxBytes " +
              s"$maxBytes — raise maxBytes to read past it")
            at = until // log ends below the planned bound
          } else {
            at = records.last.offset + 1
            buf = records.iterator.filter(_.offset < until)
          }
        }
      override def hasNext: Boolean = { pull(); buf.hasNext }
      override def next(): Record = { pull(); buf.next() }
    }
  }

  /** Append `records` to one partition (Produce v0, acks=1). Returns the
    * base offset the broker assigned. */
  def produce(host: String, port: Int, topic: String, partition: Int,
              records: Seq[(Array[Byte], Array[Byte])]): Long = {
    require(records.nonEmpty, "empty produce batch")
    val set = messageSet(records)
    val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
    o.writeShort(1) // acks: leader
    o.writeInt(30000)
    o.writeInt(1); writeString(o, topic)
    o.writeInt(1); o.writeInt(partition)
    o.writeInt(set.length); o.write(set)
    val resp = rpc(host, port, apiKey = 0, body.toByteArray)
    val b = ByteBuffer.wrap(resp)
    val nTopics = b.getInt; require(nTopics == 1, s"produce: $nTopics topics")
    skipString(b)
    val nParts = b.getInt; require(nParts == 1, s"produce: $nParts partitions")
    val pid = b.getInt; val err = b.getShort; val baseOffset = b.getLong
    require(err == 0, s"produce to $topic/$pid failed: error $err")
    baseOffset
  }

  /** Read `topic/partition` from `offset` to the high watermark (Fetch
    * v0, repeated until caught up — one fetch returns at most
    * `maxBytes` of message set). */
  def fetchAll(host: String, port: Int, topic: String, partition: Int,
               offset: Long = 0L, maxBytes: Int = 4 << 20): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var at = offset
    var caughtUp = false
    while (!caughtUp) {
      val (records, hw) = fetchOnce(host, port, topic, partition, at, maxBytes)
      out ++= records
      at = records.lastOption.map(_.offset + 1).getOrElse(at)
      // an EMPTY fetch below the high watermark means one message is
      // larger than maxBytes — returning what we have would present a
      // silently truncated partition as a complete read (data loss);
      // real clients raise record-too-large here, so do we
      if (records.isEmpty && at < hw) throw new IllegalStateException(
        s"$topic/$partition: message at offset $at exceeds maxBytes " +
        s"$maxBytes — raise maxBytes to read past it")
      caughtUp = at >= hw
    }
    out.result()
  }

  private def fetchOnce(host: String, port: Int, topic: String, partition: Int,
                        offset: Long, maxBytes: Int): (Seq[Record], Long) = {
    val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
    o.writeInt(-1) // replica_id: consumer
    o.writeInt(100) // max_wait_ms
    o.writeInt(0) // min_bytes
    o.writeInt(1); writeString(o, topic)
    o.writeInt(1); o.writeInt(partition); o.writeLong(offset); o.writeInt(maxBytes)
    val resp = rpc(host, port, apiKey = 1, body.toByteArray)
    val b = ByteBuffer.wrap(resp)
    val nTopics = b.getInt; require(nTopics == 1, s"fetch: $nTopics topics")
    skipString(b)
    val nParts = b.getInt; require(nParts == 1, s"fetch: $nParts partitions")
    val pid = b.getInt; val err = b.getShort; val hw = b.getLong
    require(err == 0, s"fetch of $topic/$pid failed: error $err")
    val setSize = b.getInt
    val set = new Array[Byte](setSize); b.get(set)
    (readMessageSet(set, partition), hw)
  }

  // ---- v0 message-set codec ----

  private[sources] def messageSet(records: Seq[(Array[Byte], Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream(); val o = new DataOutputStream(out)
    records.foreach { case (k, v) =>
      val msg = new ByteArrayOutputStream(); val m = new DataOutputStream(msg)
      m.writeByte(0) // magic v0
      m.writeByte(0) // attributes: no compression
      writeBytes(m, k); writeBytes(m, v)
      val payload = msg.toByteArray
      val crc = new CRC32(); crc.update(payload)
      o.writeLong(0L) // producer-side offset is ignored by the broker
      o.writeInt(4 + payload.length)
      o.writeInt(crc.getValue.toInt)
      o.write(payload)
    }
    out.toByteArray
  }

  private[sources] def readMessageSet(set: Array[Byte], partition: Int): Seq[Record] = {
    val b = ByteBuffer.wrap(set)
    val out = Seq.newBuilder[Record]
    while (b.remaining() >= 12) {
      val offset = b.getLong
      val size = b.getInt
      if (b.remaining() < size) {
        // a fetch may end in a TRUNCATED message (broker cuts at
        // maxBytes) — the next fetch re-reads it from its offset
        b.position(b.limit())
      } else {
        val crcWire = b.getInt
        val payload = new Array[Byte](size - 4); b.get(payload)
        val crc = new CRC32(); crc.update(payload)
        require(crc.getValue.toInt == crcWire,
          s"CRC mismatch at offset $offset — corrupt message")
        val pb = ByteBuffer.wrap(payload)
        val magic = pb.get
        require(magic == 0, s"unsupported message magic $magic (want v0)")
        pb.get // attributes — compression unsupported, 0 in our sets
        out += Record(partition, offset, readBytes(pb), readBytes(pb))
      }
    }
    out.result()
  }

  // ---- framing ----

  private def rpc(host: String, port: Int, apiKey: Short,
                  body: Array[Byte]): Array[Byte] = {
    val sock = new Socket(host, port)
    try {
      sock.setSoTimeout(30000)
      val header = new ByteArrayOutputStream(); val h = new DataOutputStream(header)
      h.writeShort(apiKey); h.writeShort(0) // api_version 0
      h.writeInt(7) // correlation id — one request per connection
      writeString(h, "graft")
      val o = new DataOutputStream(sock.getOutputStream)
      o.writeInt(header.size() + body.length)
      o.write(header.toByteArray); o.write(body); o.flush()
      val i = new DataInputStream(sock.getInputStream)
      val size = i.readInt()
      require(size >= 4 && size < (64 << 20), s"implausible response size $size")
      val resp = new Array[Byte](size)
      i.readFully(resp)
      val b = ByteBuffer.wrap(resp)
      require(b.getInt == 7, "correlation id mismatch")
      val rest = new Array[Byte](b.remaining()); b.get(rest)
      rest
    } finally sock.close()
  }

  private[sources] def writeString(o: DataOutputStream, s: String): Unit = {
    val bytes = s.getBytes("UTF-8")
    o.writeShort(bytes.length); o.write(bytes)
  }
  private[sources] def writeBytes(o: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) o.writeInt(-1) else { o.writeInt(b.length); o.write(b) }
  private[sources] def readString(b: ByteBuffer): String = {
    val len = b.getShort
    if (len < 0) null else {
      val bytes = new Array[Byte](len); b.get(bytes); new String(bytes, "UTF-8")
    }
  }
  private def skipString(b: ByteBuffer): Unit = {
    val len = b.getShort; if (len > 0) b.position(b.position() + len)
  }
  private[sources] def readBytes(b: ByteBuffer): Array[Byte] = {
    val len = b.getInt
    if (len < 0) null else { val bytes = new Array[Byte](len); b.get(bytes); bytes }
  }
  private def skipIntArray(b: ByteBuffer): Unit = {
    val n = b.getInt; b.position(b.position() + 4 * n)
  }
}
