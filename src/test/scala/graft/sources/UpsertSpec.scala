package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Keyed parquet upsert: version-wins merge, bucket-scoped rewrites
  * (untouched partitions' files survive byte-identical), and convergence
  * under stale replay. */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table(path: String) =
    spark.read.parquet(path).select("k", "v", "ver")
      .as[(Long, String, Long)].collect().toSet

  test("upsert replaces by key, inserts new keys, one row per key") {
    val path = Files.createTempDirectory("ups").toString + "/t"
    val b1 = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "v", "ver")
    Sinks.upsertParquetByKey(b1, path, Seq("k"), "ver", buckets = 8)
    val b2 = Seq((2L, "B", 2L), (4L, "d", 2L)).toDF("k", "v", "ver")
    Sinks.upsertParquetByKey(b2, path, Seq("k"), "ver", buckets = 8)
    assert(table(path) == Set((1L, "a", 1L), (2L, "B", 2L), (3L, "c", 1L), (4L, "d", 2L)))
  }

  test("stale replay is a no-op: older versions never regress newer rows") {
    val path = Files.createTempDirectory("ups_replay").toString + "/t"
    val v1 = Seq((1L, "old", 1L)).toDF("k", "v", "ver")
    val v2 = Seq((1L, "new", 2L)).toDF("k", "v", "ver")
    Sinks.upsertParquetByKey(v1, path, Seq("k"), "ver", buckets = 4)
    Sinks.upsertParquetByKey(v2, path, Seq("k"), "ver", buckets = 4)
    Sinks.upsertParquetByKey(v1, path, Seq("k"), "ver", buckets = 4) // replay
    assert(table(path) == Set((1L, "new", 2L)))
  }

  test("within-batch duplicate keys resolve to the max version deterministically") {
    val path = Files.createTempDirectory("ups_dup").toString + "/t"
    val b = Seq((1L, "x", 1L), (1L, "y", 3L), (1L, "z", 2L)).toDF("k", "v", "ver")
    Sinks.upsertParquetByKey(b, path, Seq("k"), "ver", buckets = 4)
    assert(table(path) == Set((1L, "y", 3L)))
  }

  test("upsert_parquet_destination section drives the merge from a spec") {
    val tmp = Files.createTempDirectory("ups_sec").toString
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver")
      .write.parquet(s"$tmp/in1")
    Seq((2L, "B", 2L)).toDF("k", "v", "ver").write.parquet(s"$tmp/in2")
    def spec(in: String) =
      s"""{"sections":[
        {"id":"src","name":"parquet_source","config":{"path":"$in"}},
        {"id":"up","name":"upsert_parquet_destination","config":{
          "path":"$tmp/t","keys":"k","version_column":"ver","buckets":"4"}}],
        "edges":[["src","up"]]}"""
    graft.plans.PipelineCompiler.run(spark,
      graft.plans.PipelineSpec.fromJson(spec(s"$tmp/in1")))
    graft.plans.PipelineCompiler.run(spark,
      graft.plans.PipelineSpec.fromJson(spec(s"$tmp/in2")))
    assert(table(s"$tmp/t") == Set((1L, "a", 1L), (2L, "B", 2L)))
  }

  test("a batch rewrites ONLY the buckets its keys hash into") {
    val path = Files.createTempDirectory("ups_prune").toString + "/t"
    val big = (1L to 200L).map(i => (i, s"v$i", 1L)).toDF("k", "v", "ver")
    Sinks.upsertParquetByKey(big, path, Seq("k"), "ver", buckets = 16)
    // snapshot per-partition file lists + mtimes
    def files(): Map[String, Long] = {
      val base = new java.io.File(path)
      base.listFiles().filter(_.getName.startsWith("_bkt=")).flatMap { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified())
      }.toMap
    }
    val before = files()
    // single-key batch → exactly one bucket touched
    Sinks.upsertParquetByKey(Seq((7L, "V7", 2L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 16)
    val after = files()
    val survivors = before.keySet intersect after.keySet
    // untouched buckets: same files, same mtimes (never re-written)
    assert(survivors.nonEmpty)
    assert(survivors.forall(f => before(f) == after(f)))
    // at least one bucket was replaced (7's bucket)
    assert(before.keySet != after.keySet)
    // and the merge is correct
    val got = spark.read.parquet(path).filter($"k" === 7L)
      .select("v", "ver").as[(String, Long)].head()
    assert(got == (("V7", 2L)))
    assert(spark.read.parquet(path).count() == 200)
  }

  test("bucket-count mismatch fails fast (layout persisted in meta)") {
    val path = Files.createTempDirectory("ups_meta").toString + "/t"
    val b1 = Seq((1L, "a", 1L)).toDF("k", "v", "ver")
    Sinks.upsertParquetByKey(b1, path, Seq("k"), "ver", buckets = 8)
    assert(new java.io.File(path, "_graft_upsert_meta.json").exists(),
      "bucket count must be persisted on first write")
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertParquetByKey(Seq((2L, "b", 1L)).toDF("k", "v", "ver"),
        path, Seq("k"), "ver", buckets = 16)
    }
    assert(e.getMessage.contains("8") && e.getMessage.contains("16"))
    // same modulus still works
    Sinks.upsertParquetByKey(Seq((2L, "b", 1L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 8)
    assert(table(path) == Set((1L, "a", 1L), (2L, "b", 1L)))
  }

  test("stale staging dir from a crashed merge is discarded, not merged") {
    val path = Files.createTempDirectory("ups_stage").toString + "/t"
    Sinks.upsertParquetByKey(Seq((1L, "a", 1L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 4)
    // simulate a crash mid-stage: a partial staging dir with garbage
    val staging = new java.io.File(path, "_graft_staging/_bkt=0")
    assert(staging.mkdirs())
    Files.write(staging.toPath.resolve("garbage.parquet"), Array[Byte](1, 2, 3))
    Sinks.upsertParquetByKey(Seq((2L, "b", 1L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 4)
    assert(!new java.io.File(path, "_graft_staging").exists(),
      "stale staging must be deleted by the next merge")
    assert(table(path) == Set((1L, "a", 1L), (2L, "b", 1L)))
  }

  test("missing meta: inconsistent modulus rejected, consistent one adopted") {
    val path = Files.createTempDirectory("ups_nometa").toString + "/t"
    val rows = (1L to 50L).map(i => (i, s"v$i", 1L)).toDF("k", "v", "ver")
    Sinks.upsertParquetByKey(rows, path, Seq("k"), "ver", buckets = 16)
    // simulate a pre-meta table / crash-before-meta: delete the record
    assert(new java.io.File(path, "_graft_upsert_meta.json").delete())
    // a modulus the on-disk bucket ids contradict must fail loudly —
    // silently adopting it would leave stale keys in unreachable buckets
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertParquetByKey(Seq((1L, "X", 2L)).toDF("k", "v", "ver"),
        path, Seq("k"), "ver", buckets = 4)
    }
    assert(e.getMessage.contains("no layout meta"))
    // the original modulus is consistent with every bucket id → adopted,
    // meta restored, merge correct
    Sinks.upsertParquetByKey(Seq((1L, "X", 2L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 16)
    assert(new java.io.File(path, "_graft_upsert_meta.json").exists())
    assert(spark.read.parquet(path).filter($"k" === 1L)
      .select("v").as[String].head() == "X")
    assert(spark.read.parquet(path).count() == 50)
  }

  test("missing meta: modulus passing the maxBkt check is still rejected when keys re-hash elsewhere") {
    // the trap: a table written with modulus 16 whose materialized bucket
    // ids all happen to be < 5 passes the maxBkt < buckets check for
    // buckets=5, yet 5 does not divide 16 — keys re-hash to different
    // buckets and the merge would leave stale versions where it never
    // reads. The adoption path must PROVE the modulus by re-hashing.
    val low = spark.range(1, 2001)
      .select($"id", pmod(hash($"id"), lit(16)).as("b"))
      .filter($"b" < 5).select($"id").as[Long].collect().take(12).toSeq
    assert(low.size == 12, "fixture: need keys hashing below bucket 5")
    val path = Files.createTempDirectory("ups_rehash").toString + "/t"
    Sinks.upsertParquetByKey(low.map(i => (i, s"v$i", 1L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 16)
    assert(new java.io.File(path, "_graft_upsert_meta.json").delete())
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertParquetByKey(Seq((low.head, "X", 2L)).toDF("k", "v", "ver"),
        path, Seq("k"), "ver", buckets = 5)
    }
    assert(e.getMessage.contains("re-hash"), e.getMessage)
  }

  test("meta-only directory (crash before first data write) is fresh; meta atomically replaced") {
    val path = Files.createTempDirectory("ups_metaonly").toString + "/t"
    new java.io.File(path).mkdirs()
    Files.writeString(new java.io.File(path, "_graft_upsert_meta.json").toPath,
      """{"buckets":8}""")
    // no _bkt dirs → fresh table; a different modulus is fine and the
    // stale meta is replaced in one atomic rename (no delete window)
    Sinks.upsertParquetByKey(Seq((1L, "a", 1L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 4)
    val meta = Files.readString(
      new java.io.File(path, "_graft_upsert_meta.json").toPath)
    assert(meta.contains("\"buckets\":4"), meta)
    assert(table(path) == Set((1L, "a", 1L)))
  }

  test("interrupted bucket swap (bak left, live missing) is auto-restored") {
    val path = Files.createTempDirectory("ups_bak").toString + "/t"
    val rows = (1L to 50L).map(i => (i, s"v$i", 1L)).toDF("k", "v", "ver")
    Sinks.upsertParquetByKey(rows, path, Seq("k"), "ver", buckets = 4)
    val total = spark.read.parquet(path).count()
    // simulate a crash between "retire old" and "commit new": one live
    // bucket renamed to its bak, nothing staged in its place
    val base = new java.io.File(path)
    val victim = base.listFiles().filter(_.getName.startsWith("_bkt=")).head
    val bak = new java.io.File(base, s".graftbak${victim.getName}")
    assert(victim.renameTo(bak))
    // next upsert must first restore the committed rows, then merge
    Sinks.upsertParquetByKey(Seq((1L, "V1", 2L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 4)
    assert(!bak.exists(), "bak must be consumed by recovery")
    assert(spark.read.parquet(path).count() == total,
      "no committed rows may be lost to the interrupted swap")
    assert(spark.read.parquet(path).filter($"k" === 1L)
      .select("v").as[String].head() == "V1")
  }

  private def snapTable(path: String) =
    Sources.readUpsertSnapshot(spark, path).select("k", "v", "ver")
      .as[(Long, String, Long)].collect().toSet

  test("snapshot upsert: version-wins merge through the manifest, stale replay no-op") {
    val path = Files.createTempDirectory("ups_snap").toString + "/t"
    val b1 = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "v", "ver")
    Sinks.upsertSnapshotByKey(b1, path, Seq("k"), "ver", buckets = 8)
    val b2 = Seq((2L, "B", 2L), (4L, "d", 2L)).toDF("k", "v", "ver")
    Sinks.upsertSnapshotByKey(b2, path, Seq("k"), "ver", buckets = 8)
    assert(snapTable(path) ==
      Set((1L, "a", 1L), (2L, "B", 2L), (3L, "c", 1L), (4L, "d", 2L)))
    // stale replay: the older version never regresses the newer row
    Sinks.upsertSnapshotByKey(Seq((2L, "b", 1L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 8)
    assert(snapTable(path).contains((2L, "B", 2L)))
    // modulus pinned in the manifest
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertSnapshotByKey(b1, path, Seq("k"), "ver", buckets = 4)
    }
    assert(e.getMessage.contains("bucket count"), e.getMessage)
  }

  test("snapshot upsert: concurrent readers see all-old or all-new, never a torn batch") {
    val path = Files.createTempDirectory("ups_snap_iso").toString + "/t"
    val keys = 1L to 200L
    Sinks.upsertSnapshotByKey(
      keys.map(k => (k, "old", 1L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 16)
    // reader loop races the whole-table rewrite below: each resolve
    // must see ONE tag across all 16 buckets — the torn mix the
    // in-place swap scheme permits is exactly what the manifest commit
    // forbids
    @volatile var done = false
    @volatile var torn: Option[Set[String]] = None
    var reads = 0
    val reader = new Thread(() => {
      while (!done && torn.isEmpty) {
        val tags = Sources.readUpsertSnapshot(spark, path)
          .select("v").distinct().as[String].collect().toSet
        reads += 1
        if (tags != Set("old") && tags != Set("new")) torn = Some(tags)
      }
    }, "snapshot-reader")
    reader.start()
    try Sinks.upsertSnapshotByKey(
      keys.map(k => (k, "new", 2L)).toDF("k", "v", "ver"),
      path, Seq("k"), "ver", buckets = 16)
    finally { done = true; reader.join(60000) }
    assert(torn.isEmpty, s"reader observed a torn batch: $torn")
    assert(reads > 0, "the reader loop must have raced at least one read")
    assert(snapTable(path) == keys.map(k => (k, "new", 2L)).toSet)
  }

  test("snapshot upsert: time travel via retained manifest versions; GC honors the horizon") {
    val path = Files.createTempDirectory("ups_tt").toString + "/t"
    def up(rows: Seq[(Long, String, Long)], retain: Int): Unit =
      Sinks.upsertSnapshotByKey(rows.toDF("k", "v", "ver"), path,
        Seq("k"), "ver", buckets = 4, retain = retain)
    def at(epoch: Long) =
      Sources.readUpsertSnapshot(spark, path, asOf = Some(epoch))
        .select("k", "v", "ver").as[(Long, String, Long)].collect().toSet
    up(Seq((1L, "a", 1L)), retain = 3)                 // epoch 0
    up(Seq((1L, "A", 2L), (2L, "b", 1L)), retain = 3)  // epoch 1
    up(Seq((3L, "c", 1L)), retain = 3)                 // epoch 2
    // each retained version reads back exactly as it committed
    assert(at(0L) == Set((1L, "a", 1L)))
    assert(at(1L) == Set((1L, "A", 2L), (2L, "b", 1L)))
    assert(at(2L) == Set((1L, "A", 2L), (2L, "b", 1L), (3L, "c", 1L)))
    assert(snapTable(path) == at(2L)) // current == newest
    // asOf between versions resolves to the newest not-after snapshot
    assert(at(99L) == at(2L))
    // shrinking the horizon GCs the oldest version and its sole data
    up(Seq((4L, "d", 1L)), retain = 2)                 // epoch 3
    val err = intercept[IllegalArgumentException] { at(0L) }
    assert(err.getMessage.contains("retained versions"))
    assert(at(2L) == Set((1L, "A", 2L), (2L, "b", 1L), (3L, "c", 1L)),
      "snapshots inside the horizon must survive the GC")
  }

  test("snapshot upsert: retired epoch buckets survive one generation, then GC") {
    val path = Files.createTempDirectory("ups_snap_gc").toString + "/t"
    def up(k: Long, v: String, ver: Long): Unit =
      Sinks.upsertSnapshotByKey(Seq((k, v, ver)).toDF("k", "v", "ver"),
        path, Seq("k"), "ver", buckets = 4)
    up(1L, "a", 1L) // epoch 0
    val base = new java.io.File(path)
    def bucketDirs(epoch: Long): Set[String] = {
      val d = new java.io.File(base, s".graft_e$epoch")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.startsWith("_bkt=")).map(_.getName).toSet
    }
    val b0 = bucketDirs(0)
    assert(b0.size == 1)
    up(1L, "b", 2L) // epoch 1 retires epoch 0's bucket...
    assert(bucketDirs(0) == b0,
      "retired bucket must survive its grace generation for in-flight readers")
    up(1L, "c", 3L) // ...and epoch 2's GC collects it (epoch 0 now empty)
    assert(bucketDirs(0).isEmpty && !new java.io.File(base, ".graft_e0").exists(),
      "fully-retired epoch dir must be garbage-collected")
    assert(snapTable(path) == Set((1L, "c", 3L)))
    // an orphan epoch dir from a crashed, never-committed batch is
    // removed by the next upsert's GC and never becomes visible
    val orphan = new java.io.File(base, ".graft_e99/_bkt=0")
    assert(orphan.mkdirs())
    up(2L, "x", 1L)
    assert(!new java.io.File(base, ".graft_e99").exists(),
      "uncommitted orphan epoch must be GC'd")
  }
}
