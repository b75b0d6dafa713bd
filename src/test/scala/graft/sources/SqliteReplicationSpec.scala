package graft.sources

import graft.TestSpark
import graft.plans.StateStore
import org.scalatest.funsuite.AnyFunSuite

/** SQLite physical replication (S10/D9): page-diff snapshots from a live
  * db+WAL, acked cursor, idempotent replica apply. The fixtures were
  * generated with stock SQLite in WAL mode (`replfix.db` + two captured
  * WAL states: `.s1` = one extra commit, `.s2` = two more on top —
  * prefix-property holds, so copying `.sK` over the live `-wal` path
  * simulates the database advancing between ticks). */
class SqliteReplicationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val res = "/root/repo/src/test/resources"

  private def tempDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Copy the fixture main file (+ chosen wal state) into a scratch dir
    * so tests can advance the wal without touching resources. */
  private def stage(dir: String, walState: Option[String]): Unit = {
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$res/replfix.db"),
      java.nio.file.Paths.get(s"$dir/replfix.db"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val wal = java.nio.file.Paths.get(s"$dir/replfix.db-wal")
    walState match {
      case Some(stateFile) =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$res/$stateFile"), wal,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      case None => java.nio.file.Files.deleteIfExists(wal); ()
    }
  }

  private def effective(dir: String): Array[Byte] = {
    val main = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/replfix.db"))
    val walPath = java.nio.file.Paths.get(s"$dir/replfix.db-wal")
    val wal = if (java.nio.file.Files.exists(walPath))
      Some(java.nio.file.Files.readAllBytes(walPath)) else None
    SqliteFile.applyWal(main, wal)
  }

  test("first tick ships a full snapshot; replica bytes equal the effective database") {
    val db = tempDir("repl_db"); val rep = tempDir("repl_out")
    stage(db, Some("replfix.db-wal.s1"))
    val store = new StateStore(tempDir("repl_state"))
    val n = SqliteReplication.tick(spark, store, "p", "s", s"$db/replfix.db")(
      SqliteReplication.applySnapshots(_, rep))
    assert(n == 2L) // both pages: nothing in the cursor yet
    val replica = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$rep/replfix.db"))
    assert(java.util.Arrays.equals(replica, effective(db)))
    // the replica answers queries identically through the B-tree reader
    assert(SqliteFile.readTable(replica, "kv") ==
      SqliteFile.readTable(effective(db), "kv"))
  }

  test("second tick after the wal advances ships ONLY the changed page; replica converges") {
    val db = tempDir("repl_db2"); val rep = tempDir("repl_out2")
    stage(db, Some("replfix.db-wal.s1"))
    val store = new StateStore(tempDir("repl_state2"))
    val first = SqliteReplication.tick(spark, store, "p", "s",
      s"$db/replfix.db")(SqliteReplication.applySnapshots(_, rep))
    assert(first == 2L)
    // database advances: two more commits land in the wal
    stage(db, Some("replfix.db-wal.s2"))
    val second = SqliteReplication.tick(spark, store, "p", "s",
      s"$db/replfix.db")(SqliteReplication.applySnapshots(_, rep))
    // independent python page-diff says s1→s2 changes exactly page 2
    assert(second == 1L, s"expected only the changed page, got $second rows")
    val replica = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$rep/replfix.db"))
    assert(java.util.Arrays.equals(replica, effective(db)))
    assert(SqliteFile.readTable(replica, "kv").map(_.toList).toSet ==
      Set(List("1", "base-upd"), List("2", "second"), List("3", "third")))
    // caught up: a third tick with no change ships nothing
    val third = SqliteReplication.tick(spark, store, "p", "s",
      s"$db/replfix.db")(_ => fail("sink must not run on an empty slice"))
    assert(third == 0L)
  }

  test("replaying an already-applied snapshot is skipped by the watermark (idempotent)") {
    val db = tempDir("repl_db3"); val rep = tempDir("repl_out3")
    stage(db, Some("replfix.db-wal.s1"))
    val slice = SqliteReplication.snapshotFrame(spark, s"$db/replfix.db", Map.empty)
      .cache()
    SqliteReplication.applySnapshots(slice, rep)
    val after1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$rep/replfix.db"))
    // crash-replay: the same snapshot arrives again
    SqliteReplication.applySnapshots(slice, rep)
    val after2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$rep/replfix.db"))
    assert(java.util.Arrays.equals(after1, after2))
    val mark = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$rep/replfix.db.applied")).get(0)
    assert(mark == "1")
    slice.unpersist()
  }

  test("a shrinking database truncates the replica (size-only marker row)") {
    val db = tempDir("repl_db4"); val rep = tempDir("repl_out4")
    stage(db, None)
    val store = new StateStore(tempDir("repl_state4"))
    SqliteReplication.tick(spark, store, "p", "s", s"$db/replfix.db")(
      SqliteReplication.applySnapshots(_, rep))
    // simulate a vacuum: same first page, database now half the size
    val main = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$db/replfix.db"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$db/replfix.db"),
      java.util.Arrays.copyOf(main, 4096))
    val n = SqliteReplication.tick(spark, store, "p", "s",
      s"$db/replfix.db")(SqliteReplication.applySnapshots(_, rep))
    assert(n == 1L) // the size-only marker
    val replica = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$rep/replfix.db"))
    assert(replica.length == 4096)
    assert(java.util.Arrays.equals(replica,
      java.util.Arrays.copyOf(main, 4096)))
  }

  test("replication sections compile from a pipeline spec") {
    val db = tempDir("repl_db5"); val rep = tempDir("repl_out5")
    stage(db, Some("replfix.db-wal.s2"))
    val json =
      s"""{"sections":[
        {"id":"src","name":"sqlite_replication_source","config":{"path":"$db/replfix.db"}},
        {"id":"dst","name":"sqlite_replication_destination","config":{"replica_dir":"$rep"}}],
        "edges":[["src","dst"]]}"""
    graft.plans.PipelineCompiler.run(spark,
      graft.plans.PipelineSpec.fromJson(json))
    val replica = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$rep/replfix.db"))
    assert(java.util.Arrays.equals(replica, effective(db)))
  }
}
