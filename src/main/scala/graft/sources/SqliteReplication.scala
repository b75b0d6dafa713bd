package graft.sources

import graft.plans.StateStore
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQLite PHYSICAL replication (SURVEY §2.1 S10 / §2.3 D9 — reference
  * `sections/sqlite_physical_replication/src/{source,destination}.rs`):
  * page-level snapshots of a live database shipped as rows and replayed
  * into a byte-identical replica file, no SQL in the loop.
  *
  * The reference streams its VFS-journal's page blobs keyed by a
  * monotonically increasing snapshot id, acks the id as its cursor, and
  * the destination replays `(offset, blob)` writes into the replica
  * (`destination.rs:131-139` seeks + writes each blob). Re-expressed
  * Spark-first over the PUBLIC change feed SQLite itself maintains — the
  * database file plus its WAL ([[SqliteFile.applyWal]]'s recovery-rule
  * overlay):
  *
  *  - SOURCE ([[tick]]): per origin, the effective bytes (main ⊕
  *    committed WAL frames) are page-hashed EXECUTOR-SIDE; pages whose
  *    hash differs from the stored cursor state become one row each
  *    `(origin, snapshot_id, page_size, blob_num, offset, blob_size,
  *    blob, blob_hash, db_size)` — the reference's journal-blob schema
  *    (`source.rs:37-45`) plus the hash (so the cursor advances from the
  *    emitted slice without re-reading) and `db_size` (so a VACUUM'd
  *    replica truncates — the reference's journal cannot shrink a db,
  *    FIXME'd in `destination.rs:130`). First tick = full snapshot.
  *    A size-only change (truncation with no surviving page changed)
  *    emits a `blob_num = 0` marker row carrying the new `db_size`.
  *  - CURSOR: per-origin `(snapshot_id, per-page hashes)` persisted in
  *    the section [[StateStore]] strictly AFTER the sink commit — the
  *    same ack-after-commit contract as [[KafkaWireCursor]]; a crash
  *    between sink and state write replays one slice, and page writes
  *    are idempotent, so the replica converges. State is 8 bytes per
  *    page — ~2 MB cursor per GB of database, model-sized.
  *  - DESTINATION ([[applySnapshots]]): one task per origin (hash
  *    repartition + in-partition sort), rows applied in `(snapshot_id,
  *    blob_num)` order by seek+write into the replica, then truncate to
  *    the last snapshot's `db_size`. A sidecar `<replica>.applied`
  *    watermark skips already-applied snapshots on replay (idempotent
  *    at-least-once; a crash after writes but before the watermark
  *    re-applies byte-identical pages).
  *
  * Parity is provable with the in-repo reader: after apply, the replica
  * bytes equal `applyWal(main, wal)` exactly, so
  * [[SqliteFile.readTable]] returns identical rows from source and
  * replica — pinned in `SqliteReplicationSpec`, with the page-diff
  * expectations cross-checked against an independent Python
  * implementation in the `op_sqlite_repl` oracle.
  */
object SqliteReplication {

  val schema: StructType = StructType(Seq(
    StructField("origin", StringType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("page_size", IntegerType, nullable = false),
    StructField("blob_num", IntegerType, nullable = false), // 1-based page, 0 = size-only marker
    StructField("offset", LongType, nullable = false),
    StructField("blob_size", IntegerType, nullable = false),
    StructField("blob", BinaryType, nullable = false),
    StructField("blob_hash", LongType, nullable = false),
    StructField("db_size", LongType, nullable = false)))

  private def pageHash(b: Array[Byte], off: Int, len: Int): Long = {
    // FNV-1a 64 over the page — cheap, stable, and computed where the
    // bytes already are (the executor); collisions only cost an
    // unnecessary page re-send, never a wrong replica (the blob itself
    // ships, the hash is only the change detector)
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** The changed-page snapshot frame for every database matching `path`,
    * diffed against `prev` = origin → (snapshotId, pageHashes). Pure
    * function of (files, prev) — recomputation under executor loss
    * rebuilds identical rows because the WAL overlay applies only
    * COMMITTED frames (a writer appending mid-tick cannot change what a
    * committed prefix yields... a new commit landing between task
    * attempts could — which is why [[tick]] advances the cursor from the
    * hashes in the SUNK slice, never from a re-read). */
  def snapshotFrame(spark: SparkSession, path: String,
                    prev: Map[String, (Long, Array[Long])]): DataFrame = {
    val main = spark.read.format("binaryFile").load(path)
      .select(input_file_name().as("origin"), col("content"))
    val hPath = new org.apache.hadoop.fs.Path(path + "-wal")
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val haveWal = Option(fs.globStatus(hPath)).exists(_.nonEmpty)
    val bin =
      if (!haveWal) main.withColumn("wal", lit(null).cast(BinaryType))
      else main.join(
        spark.read.format("binaryFile").load(path + "-wal")
          .select(regexp_replace(input_file_name(), "-wal$", "").as("origin"),
            col("content").as("wal")),
        Seq("origin"), "left")
    val prevB = spark.sparkContext.broadcast(prev)
    val rowRdd = bin.select("origin", "content", "wal").rdd.flatMap { r =>
      val origin = r.getString(0)
      val eff = SqliteFile.applyWal(r.getAs[Array[Byte]](1),
        Option(r.getAs[Array[Byte]](2)))
      val raw = ((eff(16) & 0xff) << 8) | (eff(17) & 0xff)
      val ps = if (raw == 1) 65536 else raw
      val nPages = eff.length / ps
      val (prevSnap, prevHashes) =
        prevB.value.getOrElse(origin, (0L, Array.empty[Long]))
      val snapId = prevSnap + 1
      val changed = (0 until nPages).flatMap { i =>
        val h = pageHash(eff, i * ps, ps)
        if (i < prevHashes.length && prevHashes(i) == h) scala.None
        else Some(Row(origin, snapId, ps, i + 1, i.toLong * ps, ps,
          java.util.Arrays.copyOfRange(eff, i * ps, (i + 1) * ps),
          h, eff.length.toLong))
      }
      if (changed.nonEmpty) changed
      else if (nPages != prevHashes.length)
        // pure truncation: nothing to write, but the replica must shrink
        Seq(Row(origin, snapId, ps, 0, 0L, 0, Array.empty[Byte],
          0L, eff.length.toLong))
      else Seq.empty
    }
    spark.createDataFrame(rowRdd, schema)
  }

  // ------------------------------------------------------------- cursor

  private def stateKey(origin: String): String =
    "repl_" + java.security.MessageDigest.getInstance("MD5")
      .digest(origin.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def loadState(store: StateStore, pipeline: String,
                        section: String): Map[String, (Long, Array[Long])] =
    store.load(pipeline, section).collect {
      case (k, v) if k.startsWith("repl_") =>
        // value = "<origin>\n<snapId>|<h0,h1,...>"
        val nl = v.indexOf('\n')
        val origin = v.substring(0, nl)
        val rest = v.substring(nl + 1)
        val bar = rest.indexOf('|')
        val hashes = rest.substring(bar + 1) match {
          case "" => Array.empty[Long]
          case s => s.split(',').map(_.toLong)
        }
        origin -> (rest.substring(0, bar).toLong, hashes)
    }

  /** One tick: snapshot-diff every matched database, hand the slice to
    * `sink`, then advance each origin's `(snapshot_id, page hashes)` —
    * derived from the SUNK rows, not a re-read — strictly after the sink
    * returned. Returns rows processed (0 = caught up). */
  def tick(spark: SparkSession, store: StateStore, pipeline: String,
           section: String, path: String)(sink: DataFrame => Unit): Long = {
    val prev = loadState(store, pipeline, section)
    // localCheckpoint, not persist: a persisted-only slice recomputes
    // from the FILES under block loss, and a commit landing mid-tick
    // would make the recomputed rows differ from what the sink already
    // wrote — the cursor would then store hashes for pages never
    // shipped (silent divergence). Checkpointing drops the lineage:
    // lost blocks fail the tick loudly and the at-least-once replay
    // re-ships a consistent slice.
    val slice = snapshotFrame(spark, path, prev).localCheckpoint(true)
    try {
      val n = slice.count()
      if (n > 0) {
        sink(slice)
        // collect only the cursor material: (origin, page, hash, size) —
        // O(changed pages) longs, the blobs never reach the driver
        val meta = slice.select(col("origin"), col("snapshot_id"),
            col("page_size"), col("blob_num"), col("blob_hash"), col("db_size"))
          .collect()
        val advanced = meta.groupBy(_.getString(0)).map { case (origin, rows) =>
          val ps = rows.head.getInt(2)
          val snapId = rows.head.getLong(1)
          val nPages = (rows.head.getLong(5) / ps).toInt
          val prevHashes = prev.get(origin).map(_._2).getOrElse(Array.empty[Long])
          val hashes = new Array[Long](nPages)
          (0 until nPages).foreach { i =>
            if (i < prevHashes.length) hashes(i) = prevHashes(i) }
          rows.foreach { r =>
            val pg = r.getInt(3)
            if (pg >= 1 && pg <= nPages) hashes(pg - 1) = r.getLong(4) }
          stateKey(origin) ->
            s"$origin\n$snapId|${hashes.mkString(",")}"
        }.toSeq
        store.set(pipeline, section, advanced: _*)
      }
      n
    } finally { slice.unpersist(); () }
  }

  /** Drive ticks until caught up (the reference's zero-interval catch-up
    * loop) — with a changing database each tick ships one snapshot. */
  def catchUp(spark: SparkSession, store: StateStore, pipeline: String,
              section: String, path: String, maxTicks: Int = 100)
             (sink: DataFrame => Unit): Long = {
    var total = 0L; var ticks = 0; var n = -1L
    while (n != 0L && ticks < maxTicks) {
      n = tick(spark, store, pipeline, section, path)(sink)
      total += n; ticks += 1
    }
    total
  }

  // -------------------------------------------------------- destination

  /** Apply snapshot rows to replica files under `replicaDir` — one
    * `<replicaDir>/<basename(origin)>` per origin. One task per origin
    * (hash repartition on origin, rows sorted by (snapshot_id, blob_num)
    * within the partition); each snapshot beyond the sidecar watermark
    * seek+writes its blobs then truncates to its `db_size`; the
    * watermark file commits last. Replay of an already-applied snapshot
    * is skipped by the watermark — and would be byte-idempotent anyway.
    * `replicaDir` must be reachable from executors (local mode: any
    * local dir; cluster: a shared mount — the reference's destination is
    * equally single-filesystem, `destination.rs:56-63`). */
  def applySnapshots(df: DataFrame, replicaDir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(replicaDir))
    df.select("origin", "snapshot_id", "blob_num", "offset", "blob_size",
        "blob", "db_size")
      .repartition(col("origin"))
      .sortWithinPartitions("origin", "snapshot_id", "blob_num")
      .foreachPartition { rows: Iterator[Row] =>
        // STREAMING apply — one row in flight at a time: a first full
        // snapshot of a large database must not materialize in task
        // memory (the sorted iterator arrives grouped by origin, so one
        // open file handle is all the state this needs)
        var origin: String = null
        var raf: java.io.RandomAccessFile = null
        var applied = 0L
        var lastSize = -1L
        var maxSnap = 0L
        var wrote = false
        var mark: java.nio.file.Path = null
        def closeOrigin(): Unit = if (origin != null) {
          if (raf != null) {
            if (lastSize >= 0 && wrote) raf.setLength(lastSize)
            raf.close(); raf = null
          }
          if (wrote) // watermark commits last
            java.nio.file.Files.write(mark,
              maxSnap.toString.getBytes("UTF-8"))
          origin = null; wrote = false; lastSize = -1L; maxSnap = 0L
        }
        try {
          rows.foreach { r =>
            val o = r.getString(0)
            if (o != origin) {
              closeOrigin()
              origin = o
              val name = o.substring(o.lastIndexOf('/') + 1)
              mark = java.nio.file.Paths.get(replicaDir, name + ".applied")
              applied =
                if (java.nio.file.Files.exists(mark))
                  new String(java.nio.file.Files.readAllBytes(mark),
                    "UTF-8").trim.toLong
                else 0L
              raf = new java.io.RandomAccessFile(
                java.nio.file.Paths.get(replicaDir, name).toFile, "rw")
            }
            val snap = r.getLong(1)
            if (snap > applied) {
              if (r.getInt(2) > 0) { // blob_num 0 = size-only marker
                raf.seek(r.getLong(3))
                raf.write(r.getAs[Array[Byte]](5))
              }
              lastSize = r.getLong(6)
              maxSnap = math.max(maxSnap, snap)
              wrote = true
            }
          }
          closeOrigin()
        } finally if (raf != null) raf.close()
      }
  }
}
