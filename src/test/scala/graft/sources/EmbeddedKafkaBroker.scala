package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import scala.collection.mutable

/** A single-node, in-memory Kafka broker speaking exactly the protocol
  * subset [[KafkaWire]] uses — Metadata/Produce/Fetch v0 — so the kafka
  * source/sink pair can be driven END TO END over real sockets in a
  * container with no kafka jars. Test infrastructure: topics auto-create
  * with `numPartitions`, the "log" is an in-memory vector per partition,
  * offsets are assigned under the partition's lock, and fetches honor
  * the requester's maxBytes by truncating the returned message set
  * (exercising the client's partial-message handling). */
final class EmbeddedKafkaBroker(numPartitions: Int = 2) {
  private val server = new ServerSocket(0, 64,
    java.net.InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  def host: String = "127.0.0.1"

  // (topic, partition) -> log of raw v0 messages (crc..value payloads)
  private val logs = mutable.Map.empty[(String, Int), mutable.ArrayBuffer[Array[Byte]]]
  private val topics = mutable.Set.empty[String]
  @volatile private var running = true

  private def log(topic: String, p: Int): mutable.ArrayBuffer[Array[Byte]] =
    logs.synchronized {
      topics += topic
      logs.getOrElseUpdate((topic, p), mutable.ArrayBuffer.empty)
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
        require(apiVersion == 0, s"embedded broker speaks v0 only, got $apiVersion")
        val body = apiKey match {
          case 3 => metadata(b)
          case 0 => produce(b)
          case 1 => fetch(b)
          case 2 => listOffsets(b)
          case other => throw new IllegalArgumentException(s"api $other unsupported")
        }
        out.writeInt(4 + body.length)
        out.writeInt(correlation)
        out.write(body); out.flush()
      }
    } catch {
      case _: EOFException | _: SocketException => () // client done
    } finally sock.close()

  private def metadata(req: ByteBuffer): Array[Byte] = {
    val n = req.getInt
    val requested = (0 until n).map(_ => readString(req))
    requested.foreach(t => (0 until numPartitions).foreach(p => log(t, p)))
    val known = if (requested.nonEmpty) requested
      else logs.synchronized(topics.toSeq.sorted)
    val body = newBody(); val o = body.o
    o.writeInt(1) // brokers
    o.writeInt(0); writeString(o, host); o.writeInt(port)
    o.writeInt(known.size)
    known.foreach { t =>
      o.writeShort(0); writeString(o, t)
      o.writeInt(numPartitions)
      (0 until numPartitions).foreach { p =>
        o.writeShort(0); o.writeInt(p); o.writeInt(0) // leader = broker 0
        o.writeInt(0); o.writeInt(0) // empty replicas, isr
      }
    }
    bodyBytes(body)
  }

  private def produce(req: ByteBuffer): Array[Byte] = {
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
        val messages = splitMessages(set)
        val l = log(topic, p)
        val base = l.synchronized { val b = l.size.toLong; l ++= messages; b }
        o.writeInt(p); o.writeShort(0); o.writeLong(base)
      }
    }
    bodyBytes(body)
  }

  private def fetch(req: ByteBuffer): Array[Byte] = {
    req.getInt // replica
    req.getInt // max wait
    req.getInt // min bytes
    val nTopics = req.getInt
    val body = newBody(); val o = body.o
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
          (l.drop(offset.toInt).toIndexedSeq.zipWithIndex
            .map { case (m, i) => (offset + i, m) }, l.size.toLong)
        }
        val set = new ByteArrayOutputStream()
        val so = new DataOutputStream(set)
        var budget = maxBytes
        slice.foreach { case (off, msg) =>
          // honor maxBytes the way a real broker does: the set is CUT,
          // possibly mid-message — clients must resume from the offset
          if (budget > 0) {
            val chunk = new ByteArrayOutputStream()
            val co = new DataOutputStream(chunk)
            co.writeLong(off); co.writeInt(msg.length); co.write(msg)
            val bytes = chunk.toByteArray
            val take = math.min(bytes.length, budget)
            so.write(bytes, 0, take)
            budget -= bytes.length
          }
        }
        val setBytes = set.toByteArray
        o.writeInt(p); o.writeShort(0); o.writeLong(hw)
        o.writeInt(setBytes.length); o.write(setBytes)
      }
    }
    bodyBytes(body)
  }

  /** ListOffsets v0: timestamp -1 → latest (high watermark = log size),
    * -2 → earliest (log start, always 0 here — no retention). */
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
        val p = req.getInt; val ts = req.getLong; req.getInt // max_num_offsets
        val l = log(topic, p)
        val off = if (ts == -2L) 0L else l.synchronized(l.size.toLong)
        o.writeInt(p); o.writeShort(0)
        o.writeInt(1); o.writeLong(off)
      }
    }
    bodyBytes(body)
  }

  /** Split a produced v0 message set into raw message payloads
    * (crc..value), dropping the producer's placeholder offsets. */
  private def splitMessages(set: Array[Byte]): Seq[Array[Byte]] = {
    val b = ByteBuffer.wrap(set)
    val out = Seq.newBuilder[Array[Byte]]
    while (b.remaining() >= 12) {
      b.getLong // producer offset — broker assigns the real one
      val size = b.getInt
      val msg = new Array[Byte](size); b.get(msg)
      out += msg
    }
    out.result()
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
