package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import scala.collection.mutable

/** A single-node, in-memory Kafka broker speaking exactly the protocol
  * subset [[KafkaWire]] uses, in EITHER dialect:
  *
  *  - `dialect = "v0"`: Metadata/Produce/Fetch/ListOffsets v0 with
  *    magic-0 message sets — the legacy generation.
  *  - `dialect = "v2"`: Metadata v4 / ListOffsets v1 / Produce v3 /
  *    Fetch v4 with magic-2 record batches, i.e. the post-KIP-896
  *    minimum surface of a Kafka 4.x broker. Produced batches are
  *    appended with their baseOffset REWRITTEN to the log end — legal
  *    without touching the CRC32C because the v2 checksum starts at
  *    the attributes field, exactly the property real brokers rely on.
  *
  * Both modes answer ApiVersions (api 18) v0 advertising only their
  * mode's versions, so [[KafkaWire.detectDialect]] negotiates against
  * this broker the same way it would against a real one. Requests at
  * any other version are refused loudly (a 4.x broker no longer
  * accepts the removed v0 apis — tests exercise that refusal, not a
  * silent downgrade).
  *
  * Test infrastructure: topics auto-create with `numPartitions`, the
  * "log" is an in-memory vector of (baseOffset, recordCount, wire
  * frame) entries per partition, offsets are assigned under the
  * partition's lock, and fetches honor the requester's maxBytes by
  * truncating the returned set mid-entry (exercising the client's
  * partial-entry handling). */
final class EmbeddedKafkaBroker(numPartitions: Int = 2, dialect: String = "v0") {
  require(dialect == "v0" || dialect == "v2", s"dialect v0|v2, got '$dialect'")
  private val v2 = dialect == "v2"

  private val server = new ServerSocket(0, 64,
    java.net.InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  def host: String = "127.0.0.1"

  /** One appended unit: a v0 message or a v2 batch, stored as the exact
    * frame bytes a fetch response carries (offset/size/payload for v0,
    * the full batch frame for v2). */
  private final case class Entry(base: Long, count: Int, frame: Array[Byte])
  private final class PartLog {
    val entries = mutable.ArrayBuffer.empty[Entry]
    def end: Long = entries.lastOption.map(e => e.base + e.count).getOrElse(0L)
  }
  private val logs = mutable.Map.empty[(String, Int), PartLog]
  private val topics = mutable.Set.empty[String]
  @volatile private var running = true

  private def log(topic: String, p: Int): PartLog =
    logs.synchronized {
      topics += topic
      logs.getOrElseUpdate((topic, p), new PartLog)
    }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "embedded-kafka-conn")
        t.setDaemon(true); t.start()
      } catch {
        case _: SocketException => () // closed
      }
    }
  }, "embedded-kafka-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }

  // the one version of each api this broker's mode serves
  private def expectedVersion(apiKey: Short): Short = apiKey match {
    case 0 => if (v2) 3 else 0
    case 1 => if (v2) 4 else 0
    case 2 => if (v2) 1 else 0
    case 3 => if (v2) 4 else 0
    case 18 => 0
    case other => throw new IllegalArgumentException(s"api $other unsupported")
  }

  private def serve(sock: Socket): Unit =
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (running) {
        val size = in.readInt()
        val frame = new Array[Byte](size); in.readFully(frame)
        val b = ByteBuffer.wrap(frame)
        val apiKey = b.getShort; val apiVersion = b.getShort
        val correlation = b.getInt
        skipString(b) // client id
        require(apiVersion == expectedVersion(apiKey),
          s"embedded broker ($dialect mode): api $apiKey wants version " +
          s"${expectedVersion(apiKey)}, got $apiVersion")
        val body = apiKey match {
          case 3 => metadata(b)
          case 0 => produce(b)
          case 1 => fetch(b)
          case 2 => listOffsets(b)
          case 18 => apiVersionsResp()
        }
        out.writeInt(4 + body.length)
        out.writeInt(correlation)
        out.write(body); out.flush()
      }
    } catch {
      case _: EOFException | _: SocketException => () // client done
    } finally sock.close()

  private def apiVersionsResp(): Array[Byte] = {
    val body = newBody(); val o = body.o
    o.writeShort(0) // error
    val apis: Seq[Short] = Seq(0, 1, 2, 3, 18).map(_.toShort)
    o.writeInt(apis.size)
    apis.foreach { k =>
      val ver = expectedVersion(k)
      o.writeShort(k); o.writeShort(ver); o.writeShort(ver)
    }
    bodyBytes(body)
  }

  private def metadata(req: ByteBuffer): Array[Byte] = {
    val n = req.getInt
    val requested = (0 until n).map(_ => readString(req))
    if (v2) req.get // allow_auto_topic_creation — always honored here
    requested.foreach(t => (0 until numPartitions).foreach(p => log(t, p)))
    val known = if (requested.nonEmpty) requested
      else logs.synchronized(topics.toSeq.sorted)
    val body = newBody(); val o = body.o
    if (v2) o.writeInt(0) // throttle_time_ms
    o.writeInt(1) // brokers
    o.writeInt(0); writeString(o, host); o.writeInt(port)
    if (v2) o.writeShort(-1) // rack: null
    if (v2) { o.writeShort(-1); o.writeInt(0) } // cluster_id: null; controller
    o.writeInt(known.size)
    known.foreach { t =>
      o.writeShort(0); writeString(o, t)
      if (v2) o.writeBoolean(false) // is_internal
      o.writeInt(numPartitions)
      (0 until numPartitions).foreach { p =>
        o.writeShort(0); o.writeInt(p); o.writeInt(0) // leader = broker 0
        o.writeInt(0); o.writeInt(0) // empty replicas, isr
      }
    }
    bodyBytes(body)
  }

  private def produce(req: ByteBuffer): Array[Byte] = {
    if (v2) skipString(req) // transactional_id (nullable)
    req.getShort // acks
    req.getInt // timeout
    val nTopics = req.getInt
    val body = newBody(); val o = body.o
    o.writeInt(nTopics)
    (0 until nTopics).foreach { _ =>
      val topic = readString(req)
      val nParts = req.getInt
      writeString(o, topic)
      o.writeInt(nParts)
      (0 until nParts).foreach { _ =>
        val p = req.getInt
        val setSize = req.getInt
        val set = new Array[Byte](setSize); req.get(set)
        val l = log(topic, p)
        val base = l.synchronized {
          val b0 = l.end
          if (v2) appendBatches(l, set) else appendMessages(l, set)
          b0
        }
        o.writeInt(p); o.writeShort(0); o.writeLong(base)
        if (v2) o.writeLong(-1L) // log_append_time
      }
    }
    if (v2) o.writeInt(0) // throttle_time_ms (trailing, produce v1+)
    bodyBytes(body)
  }

  /** v0 append: split the produced message set, assign an offset per
    * message, store each as a ready-to-serve wire frame. */
  private def appendMessages(l: PartLog, set: Array[Byte]): Unit = {
    val b = ByteBuffer.wrap(set)
    while (b.remaining() >= 12) {
      b.getLong // producer offset — broker assigns the real one
      val size = b.getInt
      val msg = new Array[Byte](size); b.get(msg)
      val off = l.end
      val frame = new ByteArrayOutputStream()
      val fo = new DataOutputStream(frame)
      fo.writeLong(off); fo.writeInt(msg.length); fo.write(msg)
      l.entries += Entry(off, 1, frame.toByteArray)
    }
  }

  /** v2 append: rewrite each batch's baseOffset to the log end (the
    * CRC32C starts after the rewritten field, so the frame stays
    * valid) and count records from lastOffsetDelta. */
  private def appendBatches(l: PartLog, set: Array[Byte]): Unit = {
    val b = ByteBuffer.wrap(set)
    while (b.remaining() >= 12) {
      b.getLong // producer baseOffset — rewritten below
      val batchLength = b.getInt
      val frame = new Array[Byte](12 + batchLength)
      b.position(b.position() - 12)
      b.get(frame)
      val fb = ByteBuffer.wrap(frame)
      require(frame(16) == 2, s"produce v3 requires magic-2 batches, got ${frame(16)}")
      val base = l.end
      fb.putLong(0, base)
      val lastOffsetDelta = fb.getInt(23) // epoch(4)+magic(1)+crc(4)+attrs(2) after len
      l.entries += Entry(base, lastOffsetDelta + 1, frame)
    }
  }

  private def fetch(req: ByteBuffer): Array[Byte] = {
    req.getInt // replica
    req.getInt // max wait
    req.getInt // min bytes
    if (v2) { req.getInt; req.get } // response max_bytes; isolation_level
    val nTopics = req.getInt
    val body = newBody(); val o = body.o
    if (v2) o.writeInt(0) // throttle_time_ms (fetch v1+, leading)
    o.writeInt(nTopics)
    (0 until nTopics).foreach { _ =>
      val topic = readString(req)
      val nParts = req.getInt
      writeString(o, topic)
      o.writeInt(nParts)
      (0 until nParts).foreach { _ =>
        val p = req.getInt; val offset = req.getLong; val maxBytes = req.getInt
        val l = log(topic, p)
        val (slice, hw) = l.synchronized {
          (l.entries.filter(e => e.base + e.count > offset).toIndexedSeq, l.end)
        }
        val set = new ByteArrayOutputStream()
        var budget = maxBytes
        slice.foreach { e =>
          // honor maxBytes the way a real broker does: the set is CUT,
          // possibly mid-entry — clients must resume from the offset
          if (budget > 0) {
            val take = math.min(e.frame.length, budget)
            set.write(e.frame, 0, take)
            budget -= e.frame.length
          }
        }
        val setBytes = set.toByteArray
        o.writeInt(p); o.writeShort(0); o.writeLong(hw)
        if (v2) {
          o.writeLong(hw) // last_stable_offset (no transactions)
          o.writeInt(0) // aborted_transactions: empty
        }
        o.writeInt(setBytes.length); o.write(setBytes)
      }
    }
    bodyBytes(body)
  }

  /** ListOffsets v0/v1: timestamp -1 → latest (high watermark = log
    * end), -2 → earliest (log start, always 0 here — no retention). */
  private def listOffsets(req: ByteBuffer): Array[Byte] = {
    req.getInt // replica
    val nTopics = req.getInt
    val body = newBody(); val o = body.o
    o.writeInt(nTopics)
    (0 until nTopics).foreach { _ =>
      val topic = readString(req)
      val nParts = req.getInt
      writeString(o, topic)
      o.writeInt(nParts)
      (0 until nParts).foreach { _ =>
        val p = req.getInt; val ts = req.getLong
        if (!v2) req.getInt // max_num_offsets (v0 only)
        val l = log(topic, p)
        val off = if (ts == -2L) 0L else l.synchronized(l.end)
        o.writeInt(p); o.writeShort(0)
        if (v2) { o.writeLong(-1L); o.writeLong(off) } // timestamp, offset
        else { o.writeInt(1); o.writeLong(off) } // [offset]
      }
    }
    bodyBytes(body)
  }

  private final class Body {
    val buf = new ByteArrayOutputStream()
    val o = new DataOutputStream(buf)
  }
  private def newBody(): Body = new Body
  private def bodyBytes(b: Body): Array[Byte] = { b.o.flush(); b.buf.toByteArray }

  private def writeString(o: DataOutputStream, s: String): Unit = {
    val bytes = s.getBytes("UTF-8")
    o.writeShort(bytes.length); o.write(bytes)
  }
  private def readString(b: ByteBuffer): String = {
    val len = b.getShort
    val bytes = new Array[Byte](len); b.get(bytes); new String(bytes, "UTF-8")
  }
  private def skipString(b: ByteBuffer): Unit = {
    val len = b.getShort; if (len > 0) b.position(b.position() + len)
  }
}
