package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.util.zip.{CRC32, CRC32C}

/** A minimal Kafka WIRE-PROTOCOL client in pure JDK — no kafka jars.
  *
  * Speaks TWO protocol generations, selected by [[KafkaWire.Dialect]]:
  *
  *  - [[KafkaWire.V0]]: the KIP-35-era dialect — Metadata/Produce/Fetch/
  *    ListOffsets all at version 0, with magic-0 message sets
  *    (`offset INT64, size INT32, crc INT32, magic 0, attributes 0,
  *    key BYTES, value BYTES`; CRC32 over everything after the crc
  *    field). The simplest self-contained dialect; brokers ≤ 3.x accept
  *    it, but Kafka 4.x removes it (KIP-724 drops message formats
  *    v0/v1, KIP-896 drops the pre-2.1 API versions).
  *  - [[KafkaWire.V2]]: the modern dialect at the MINIMUM versions a
  *    4.x broker still serves after KIP-896 — Metadata v4, ListOffsets
  *    v1, Produce v3, Fetch v4 — with magic-2 RECORD BATCHES (batch
  *    header + zigzag-varint records, CRC32C over attributes..end; the
  *    baseOffset sits OUTSIDE the checksum precisely so brokers can
  *    rewrite it on append).
  *
  * [[detectDialect]] negotiates like a real client: one ApiVersions v0
  * RPC (the bootstrap request every broker answers, returning
  * UNSUPPORTED_VERSION *with a parseable v0 body* when it no longer
  * speaks v0 — KIP-511's downgrade rule), picking V2 whenever the
  * broker supports the four v2-dialect versions.
  *
  * The record-set READER is dialect-agnostic: both wire layouts carry
  * the magic byte at entry offset 16 (Kafka keeps it there across
  * generations exactly so logs can be sniffed), so a single parser
  * handles v0 messages, v2 batches, or a mixed log regardless of which
  * fetch version pulled the bytes.
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

  /** Protocol generation. Case objects so executor closures capture a
    * serializable token, not config state. */
  sealed trait Dialect extends Serializable {
    private[sources] def metadataV: Short
    private[sources] def listOffsetsV: Short
    private[sources] def produceV: Short
    private[sources] def fetchV: Short
  }
  /** Legacy dialect: all apis at v0, magic-0 message sets. */
  case object V0 extends Dialect {
    private[sources] val metadataV = 0.toShort
    private[sources] val listOffsetsV = 0.toShort
    private[sources] val produceV = 0.toShort
    private[sources] val fetchV = 0.toShort
  }
  /** Modern dialect: Metadata v4 / ListOffsets v1 / Produce v3 /
    * Fetch v4 (the post-KIP-896 minimums), magic-2 record batches. */
  case object V2 extends Dialect {
    private[sources] val metadataV = 4.toShort
    private[sources] val listOffsetsV = 1.toShort
    private[sources] val produceV = 3.toShort
    private[sources] val fetchV = 4.toShort
  }

  /** Parse a dialect name from config: `v0` | `v2` | `auto` (negotiate
    * via [[detectDialect]]). */
  def dialectFor(name: String, host: String, port: Int): Dialect =
    name.toLowerCase match {
      case "v0" => V0
      case "v2" => V2
      case "auto" => detectDialect(host, port)
      case other => throw new IllegalArgumentException(
        s"kafka dialect must be v0|v2|auto, got '$other'")
    }

  /** The broker's supported version range per api key (ApiVersions v0).
    * A broker that has dropped ApiVersions v0 answers error 35 with a
    * v0-encoded body anyway (KIP-511) — both shapes parse here. */
  def apiVersions(host: String, port: Int): Map[Int, (Int, Int)] = {
    val resp = rpc(host, port, apiKey = 18, apiVersion = 0, Array.empty)
    val b = ByteBuffer.wrap(resp)
    val err = b.getShort
    require(err == 0 || err == 35, s"ApiVersions failed: error $err")
    val n = b.getInt
    (0 until n).map { _ =>
      b.getShort.toInt -> (b.getShort.toInt, b.getShort.toInt)
    }.toMap
  }

  /** Negotiate the dialect: V2 when the broker serves all four of its
    * api versions, else V0 (including ancient brokers with no
    * ApiVersions api at all, which drop the connection). */
  def detectDialect(host: String, port: Int): Dialect =
    try {
      val v = apiVersions(host, port)
      def in(key: Int, want: Int): Boolean =
        v.get(key).exists { case (lo, hi) => lo <= want && want <= hi }
      if (in(0, V2.produceV) && in(1, V2.fetchV) &&
          in(2, V2.listOffsetsV) && in(3, V2.metadataV)) V2 else V0
    } catch { case _: java.io.IOException => V0 }

  /** Partition ids of `topic` (Metadata v0 / v4). */
  def partitions(host: String, port: Int, topic: String,
                 dialect: Dialect = V0): Seq[Int] = {
    val mv = dialect.metadataV
    val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
    o.writeInt(1); writeString(o, topic)
    if (mv >= 4) o.writeBoolean(true) // allow_auto_topic_creation
    val resp = rpc(host, port, apiKey = 3, mv, body.toByteArray)
    val b = ByteBuffer.wrap(resp)
    if (mv >= 3) b.getInt // throttle_time_ms
    val nBrokers = b.getInt
    (0 until nBrokers).foreach { _ =>
      b.getInt; skipString(b); b.getInt
      if (mv >= 1) skipString(b) // rack (nullable)
    }
    if (mv >= 2) skipString(b) // cluster_id (nullable)
    if (mv >= 1) b.getInt // controller_id
    val nTopics = b.getInt
    var out = Seq.empty[Int]
    (0 until nTopics).foreach { _ =>
      val err = b.getShort; val name = readString(b)
      if (mv >= 1) b.get // is_internal
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
    * (ListOffsets v0 / v1): `-1` = latest (the high watermark), `-2` =
    * earliest (the log start). One RPC covers all partitions — this is
    * how a micro-batch planner asks "where does the next batch end"
    * without fetching a single record. */
  def offsetsAt(host: String, port: Int, topic: String,
                parts: Seq[Int], timestamp: Long,
                dialect: Dialect = V0): Map[Int, Long] = {
    require(timestamp == -1L || timestamp == -2L,
      s"ListOffsets takes -1 (latest) or -2 (earliest), got $timestamp")
    require(parts.nonEmpty, "offsetsAt needs at least one partition")
    val lv = dialect.listOffsetsV
    val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
    o.writeInt(-1) // replica_id: consumer
    o.writeInt(1); writeString(o, topic)
    o.writeInt(parts.size)
    parts.foreach { p =>
      o.writeInt(p); o.writeLong(timestamp)
      if (lv == 0) o.writeInt(1) // max_num_offsets (v0 only)
    }
    val resp = rpc(host, port, apiKey = 2, lv, body.toByteArray)
    val b = ByteBuffer.wrap(resp)
    val nTopics = b.getInt; require(nTopics == 1, s"listOffsets: $nTopics topics")
    skipString(b)
    val nParts = b.getInt
    (0 until nParts).map { _ =>
      val pid = b.getInt; val err = b.getShort
      val off =
        if (lv == 0) {
          val nOff = b.getInt
          val offs = (0 until nOff).map(_ => b.getLong)
          require(err == 0, s"listOffsets $topic/$pid: error $err")
          require(offs.nonEmpty, s"listOffsets $topic/$pid: empty offset list")
          offs.head
        } else {
          b.getLong // timestamp
          val o1 = b.getLong
          require(err == 0, s"listOffsets $topic/$pid: error $err")
          o1
        }
      pid -> off
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
                 maxBytes: Int = 4 << 20,
                 dialect: Dialect = V0): Iterator[Record] = {
    val part = partition // Iterator.partition shadows the param below
    new Iterator[Record] {
      private var at = from
      private var buf: Iterator[Record] = Iterator.empty
      private def pull(): Unit =
        while (!buf.hasNext && at < until) {
          val (records, hw) = fetchOnce(host, port, topic, part, at, maxBytes, dialect)
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

  /** Append `records` to one partition (Produce v0 / v3, acks=1).
    * Returns the base offset the broker assigned. */
  def produce(host: String, port: Int, topic: String, partition: Int,
              records: Seq[(Array[Byte], Array[Byte])],
              dialect: Dialect = V0, codec: Int = 0): Long = {
    require(records.nonEmpty, "empty produce batch")
    val pv = dialect.produceV
    require(codec == 0 || pv >= 3,
      s"codec $codec needs the v2 record-batch format (legacy dialect is plain)")
    val set = if (pv >= 3) recordBatchV2(records, codec) else messageSet(records)
    val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
    if (pv >= 3) o.writeShort(-1) // transactional_id: null
    o.writeShort(1) // acks: leader
    o.writeInt(30000)
    o.writeInt(1); writeString(o, topic)
    o.writeInt(1); o.writeInt(partition)
    o.writeInt(set.length); o.write(set)
    val resp = rpc(host, port, apiKey = 0, pv, body.toByteArray)
    val b = ByteBuffer.wrap(resp)
    val nTopics = b.getInt; require(nTopics == 1, s"produce: $nTopics topics")
    skipString(b)
    val nParts = b.getInt; require(nParts == 1, s"produce: $nParts partitions")
    val pid = b.getInt; val err = b.getShort; val baseOffset = b.getLong
    // v2+ responses carry log_append_time and trailing throttle_time;
    // nothing after baseOffset is needed, so they are simply not read
    require(err == 0, s"produce to $topic/$pid failed: error $err")
    baseOffset
  }

  /** Read `topic/partition` from `offset` to the high watermark (Fetch
    * v0 / v4, repeated until caught up — one fetch returns at most
    * `maxBytes` of record set). */
  def fetchAll(host: String, port: Int, topic: String, partition: Int,
               offset: Long = 0L, maxBytes: Int = 4 << 20,
               dialect: Dialect = V0): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var at = offset
    var caughtUp = false
    while (!caughtUp) {
      val (records, hw) = fetchOnce(host, port, topic, partition, at, maxBytes, dialect)
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
                        offset: Long, maxBytes: Int,
                        dialect: Dialect): (Seq[Record], Long) = {
    val fv = dialect.fetchV
    val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
    o.writeInt(-1) // replica_id: consumer
    o.writeInt(100) // max_wait_ms
    o.writeInt(0) // min_bytes
    if (fv >= 3) o.writeInt(maxBytes) // response-wide max_bytes
    if (fv >= 4) o.writeByte(0) // isolation_level: read_uncommitted
    o.writeInt(1); writeString(o, topic)
    o.writeInt(1); o.writeInt(partition); o.writeLong(offset); o.writeInt(maxBytes)
    val resp = rpc(host, port, apiKey = 1, fv, body.toByteArray)
    val b = ByteBuffer.wrap(resp)
    if (fv >= 1) b.getInt // throttle_time_ms
    val nTopics = b.getInt; require(nTopics == 1, s"fetch: $nTopics topics")
    skipString(b)
    val nParts = b.getInt; require(nParts == 1, s"fetch: $nParts partitions")
    val pid = b.getInt; val err = b.getShort; val hw = b.getLong
    require(err == 0, s"fetch of $topic/$pid failed: error $err")
    if (fv >= 4) {
      b.getLong // last_stable_offset
      val nAborted = b.getInt // nullable array: -1 = null
      if (nAborted > 0) b.position(b.position() + 16 * nAborted)
    }
    val setSize = b.getInt
    val set = new Array[Byte](setSize); b.get(set)
    // a v2 batch is returned WHOLE even when the fetch offset points
    // inside it — dropping the records below the requested offset is the
    // client's job (same rule real consumers apply)
    // decompression bound derived from the fetch's own maxBytes: far
    // past any real producer ratio for record data, but finite — see
    // readAllBounded
    (readRecordSet(set, partition,
      math.max(64L << 20, 32L * maxBytes)).filter(_.offset >= offset), hw)
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

  // ---- v2 record-batch codec ----

  /** One magic-2 record batch holding `records` at offset deltas
    * 0..n-1. Layout (KIP-98): baseOffset, batchLength,
    * partitionLeaderEpoch, magic, crc32c, then the CHECKSUMMED body —
    * attributes, lastOffsetDelta, timestamps, producer id/epoch/seq,
    * record count, zigzag-varint records. The broker rewrites
    * baseOffset on append; it sits before the crc field so the rewrite
    * never invalidates the checksum. Timestamps are -1 (unset
    * CreateTime): the engine's ordering contract is offsets, and a
    * fabricated wall-clock would just leak nondeterminism into tests. */
  /** Producer-compression codecs, by attribute bits 0-2: 0 none, 1 gzip
    * (JDK), 2 snappy (xerial block stream — the framing Kafka clients
    * write), 3 lz4 (LZ4 Frame; the broken-HC quirk only afflicted
    * magic-0 messages, never v2 batches), 4 zstd. snappy/lz4/zstd ride
    * the libraries Spark already ships for shuffle/parquet compression
    * — no extra dependency. */
  private def compressionOut(codec: Int,
                             raw: java.io.OutputStream): java.io.OutputStream =
    codec match {
      case 1 => new java.util.zip.GZIPOutputStream(raw)
      case 2 => new org.xerial.snappy.SnappyOutputStream(raw)
      case 3 => new net.jpountz.lz4.LZ4FrameOutputStream(raw)
      case 4 => new com.github.luben.zstd.ZstdOutputStream(raw)
      case c => throw new IllegalArgumentException(
        s"producer codec $c unsupported (0=none 1=gzip 2=snappy 3=lz4 4=zstd)")
    }

  private def compressionIn(codec: Int,
                            raw: java.io.InputStream): java.io.InputStream =
    codec match {
      case 1 => new java.util.zip.GZIPInputStream(raw)
      case 2 => new org.xerial.snappy.SnappyInputStream(raw)
      case 3 => new net.jpountz.lz4.LZ4FrameInputStream(raw)
      case 4 => new com.github.luben.zstd.ZstdInputStreamNoFinalizer(raw)
      case c => throw new IllegalArgumentException(
        s"record batch compressed with undefined codec $c " +
          "(decodable: 1=gzip 2=snappy 3=lz4 4=zstd)")
    }

  /** Per the v2 format only the concatenated records compress — the
    * batch header through the record count stays plain, and the CRC
    * covers the wire bytes (i.e. the compressed form). */
  private[sources] def recordBatchV2(records: Seq[(Array[Byte], Array[Byte])],
                                     codec: Int = 0): Array[Byte] = {
    require(codec >= 0 && codec <= 4,
      s"producer supports none(0)/gzip(1)/snappy(2)/lz4(3)/zstd(4), got codec $codec")
    val recBytes = new ByteArrayOutputStream(); val ro = new DataOutputStream(recBytes)
    records.zipWithIndex.foreach { case ((k, v), i) =>
      val rec = new ByteArrayOutputStream(); val r = new DataOutputStream(rec)
      r.writeByte(0) // record attributes (unused)
      writeVarlong(r, 0L) // timestampDelta
      writeVarlong(r, i.toLong) // offsetDelta
      writeVarBytes(r, k); writeVarBytes(r, v)
      writeVarlong(r, 0L) // header count
      val bytes = rec.toByteArray
      writeVarlong(ro, bytes.length.toLong); ro.write(bytes)
    }
    val recs =
      if (codec == 0) recBytes.toByteArray
      else {
        val bo = new ByteArrayOutputStream()
        val cs = compressionOut(codec, bo)
        cs.write(recBytes.toByteArray); cs.close()
        bo.toByteArray
      }
    val body = new ByteArrayOutputStream(); val o = new DataOutputStream(body)
    o.writeShort(codec) // attributes: codec bits 0-2, CreateTime, not txn/control
    o.writeInt(records.size - 1) // lastOffsetDelta
    o.writeLong(-1L); o.writeLong(-1L) // base/max timestamp: unset
    o.writeLong(-1L) // producerId: non-idempotent
    o.writeShort(-1); o.writeInt(-1) // producerEpoch, baseSequence
    o.writeInt(records.size)
    o.write(recs)
    val payload = body.toByteArray
    val crc = new CRC32C(); crc.update(payload)
    val out = new ByteArrayOutputStream(); val w = new DataOutputStream(out)
    w.writeLong(0L) // baseOffset — broker assigns the real one
    w.writeInt(4 + 1 + 4 + payload.length) // epoch + magic + crc + body
    w.writeInt(-1) // partitionLeaderEpoch (producers send -1)
    w.writeByte(2) // magic
    w.writeInt(crc.getValue.toInt)
    w.write(payload)
    out.toByteArray
  }

  /** Parse a fetched record set of EITHER generation (or a mixed log):
    * each entry's magic byte sits at offset 16 regardless of dialect —
    * 2 → record batch, 0 → legacy message. A truncated tail entry
    * (broker cut at maxBytes) ends the parse; the caller resumes from
    * the next offset. */
  private[sources] def readRecordSet(set: Array[Byte], partition: Int,
                                     maxDecompressedBatchBytes: Long = 64L << 20)
      : Seq[Record] = {
    val b = ByteBuffer.wrap(set)
    val out = Seq.newBuilder[Record]
    var done = false
    while (!done && b.remaining() >= 12) {
      val head = b.getLong // v0: offset; v2: baseOffset
      val size = b.getInt // v0: message size; v2: batchLength
      if (b.remaining() < size || size < 5) {
        // a fetch may end in a TRUNCATED entry (broker cuts at
        // maxBytes) — the next fetch re-reads it from its offset
        done = true
      } else set(b.position() + 4) match { // magic: entry offset 16
        case 2 => readBatchV2(b, size, head, partition, out,
          maxDecompressedBatchBytes)
        case _ => readMessageV0(b, size, head, partition, out)
      }
    }
    out.result()
  }

  /** Read `in` fully, refusing past `limit` bytes. A compressed batch
    * carries no trustworthy decompressed-size field, so a corrupt or
    * hostile broker could hand the executor-side fetch a kilobyte
    * zstd/gzip bomb that an unbounded `readAllBytes` inflates into an
    * OOM before any record-count check applies. The limit (32× the
    * fetch `maxBytes`, floored at 64 MB) sits far past real producer
    * compression ratios for record data — its job is bounding memory,
    * not policing compression. */
  private def readAllBounded(in: java.io.InputStream,
                             limit: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      require(total <= limit,
        s"compressed batch inflates past the $limit-byte decompression " +
        "bound (~32x fetch maxBytes) — refusing a potential " +
        "decompression bomb")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  private def readMessageV0(b: ByteBuffer, size: Int, offset: Long,
                            partition: Int,
                            out: scala.collection.mutable.Builder[Record, Seq[Record]]): Unit = {
    val crcWire = b.getInt
    val payload = new Array[Byte](size - 4); b.get(payload)
    val crc = new CRC32(); crc.update(payload)
    require(crc.getValue.toInt == crcWire,
      s"CRC mismatch at offset $offset — corrupt message")
    val pb = ByteBuffer.wrap(payload)
    val magic = pb.get
    require(magic == 0, s"unsupported message magic $magic (want 0 or 2)")
    pb.get // attributes — compression unsupported, 0 in our sets
    out += Record(partition, offset, readBytes(pb), readBytes(pb))
  }

  private def readBatchV2(b: ByteBuffer, batchLength: Int, baseOffset: Long,
                          partition: Int,
                          out: scala.collection.mutable.Builder[Record, Seq[Record]],
                          maxDecompressedBytes: Long = 64L << 20): Unit = {
    val end = b.position() + batchLength
    b.getInt // partitionLeaderEpoch
    val magic = b.get; require(magic == 2, s"batch magic $magic (want 2)")
    val crcWire = b.getInt
    val crc = new CRC32C()
    crc.update(b.array(), b.position(), end - b.position())
    require(crc.getValue.toInt == crcWire,
      s"CRC32C mismatch in batch at offset $baseOffset — corrupt batch")
    val attributes = b.getShort
    val isControl = (attributes & 0x20) != 0
    b.getInt // lastOffsetDelta
    b.getLong; b.getLong // base/max timestamp
    b.getLong; b.getShort; b.getInt // producer id/epoch/baseSequence
    val n = b.getInt
    // production topics overwhelmingly carry producer compression: all
    // four defined codecs decode (via libraries Spark already ships);
    // an UNDEFINED codec value still fails loudly by number rather
    // than as "corrupt batch"
    val rb: ByteBuffer = (attributes & 0x07) match {
      case 0 => b
      case c =>
        val comp = new Array[Byte](end - b.position()); b.get(comp)
        val in = compressionIn(c, new java.io.ByteArrayInputStream(comp))
        try ByteBuffer.wrap(readAllBounded(in, maxDecompressedBytes))
        finally in.close()
    }
    (0 until n).foreach { _ =>
      val len = readVarlong(rb).toInt
      val recEnd = rb.position() + len
      rb.get // record attributes
      readVarlong(rb) // timestampDelta
      val offsetDelta = readVarlong(rb)
      val key = readVarBytes(rb)
      val value = readVarBytes(rb)
      rb.position(recEnd) // headers (and anything trailing) skipped
      // control batches (txn markers) carry no user data
      if (!isControl) out += Record(partition, baseOffset + offsetDelta, key, value)
    }
    b.position(end)
  }

  // ---- zigzag varints (protobuf encoding, as the v2 record format uses) ----

  private[sources] def writeVarlong(o: DataOutputStream, v: Long): Unit = {
    var u = (v << 1) ^ (v >> 63)
    while ((u & ~0x7FL) != 0L) {
      o.writeByte(((u & 0x7FL) | 0x80L).toInt); u >>>= 7
    }
    o.writeByte(u.toInt)
  }

  private[sources] def readVarlong(b: ByteBuffer): Long = {
    var u = 0L; var shift = 0; var cur = 0
    do {
      cur = b.get & 0xFF
      u |= (cur & 0x7FL) << shift
      shift += 7
      require(shift <= 70, "malformed varlong")
    } while ((cur & 0x80) != 0)
    (u >>> 1) ^ -(u & 1L)
  }

  private def writeVarBytes(o: DataOutputStream, bytes: Array[Byte]): Unit =
    if (bytes == null) writeVarlong(o, -1L)
    else { writeVarlong(o, bytes.length.toLong); o.write(bytes) }

  private def readVarBytes(b: ByteBuffer): Array[Byte] = {
    val len = readVarlong(b).toInt
    if (len < 0) null else { val bytes = new Array[Byte](len); b.get(bytes); bytes }
  }

  // ---- framing ----

  private def rpc(host: String, port: Int, apiKey: Short, apiVersion: Short,
                  body: Array[Byte]): Array[Byte] = {
    val sock = new Socket(host, port)
    try {
      sock.setSoTimeout(30000)
      val header = new ByteArrayOutputStream(); val h = new DataOutputStream(header)
      h.writeShort(apiKey); h.writeShort(apiVersion)
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
