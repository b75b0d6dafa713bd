package graft.plans

import graft.TestSpark
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Cross-daemon pipeline split (reference `graph/src/lib.rs:119-132`
  * partial edges, `myceliald/src/scheduler.rs:263-268` Inbound/Outbound
  * classification): one spec, two Orchestrator processes, a durable dir
  * bridging them, end-to-end delivery with the ack-after-sink cursor. */
class DaemonBridgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def specFor(srcPath: String, sinkPath: String): PipelineSpec =
    PipelineSpec(
      Seq(
        SectionSpec("src", "parquet_source", Map("path" -> srcPath)),
        SectionSpec("tag", "tagging", Map("column" -> "site", "text" -> "edge-1")),
        SectionSpec("dst", "parquet_destination", Map("path" -> sinkPath))),
      Seq("src" -> "tag", "tag" -> "dst"))

  test("split: cross-daemon edge becomes an outbound/inbound bridge pair") {
    val spec = specFor("/unused", "/unused2")
    val parts = DaemonBridge.split(spec,
      Map("src" -> "A", "tag" -> "A", "dst" -> "B"),
      bridgeRoot = "/b", stateRoot = "/s")
    val a = parts("A"); val b = parts("B")
    a.validate(); b.validate()
    assert(a.sections.map(_.name).toSet ==
      Set("parquet_source", "tagging", "outbound_bridge"))
    assert(b.sections.map(_.name).toSet ==
      Set("inbound_bridge", "parquet_destination"))
    // both halves point at the SAME bridge dir, derived from the cut edge
    val outDir = a.sections.find(_.name == "outbound_bridge").get.config("dir")
    val inDir = b.sections.find(_.name == "inbound_bridge").get.config("dir")
    assert(outDir == inDir && outDir == "/b/tag__to__dst")
    // local edge survives on A; no dangling cross edge remains anywhere
    assert(a.edges.contains("src" -> "tag"))
    assert(!a.edges.exists(_._2 == "dst") && !b.edges.exists(_._1 == "tag"))
  }

  test("two orchestrators deliver a split pipeline end-to-end with ack") {
    val srcDir = tmp("db_src"); val sinkDir = tmp("db_sink")
    val bridgeRoot = tmp("db_bridge"); val stateRoot = tmp("db_state")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(srcDir)

    val parts = DaemonBridge.split(
      specFor(srcDir, s"$sinkDir/out"),
      Map("src" -> "A", "tag" -> "A", "dst" -> "B"), bridgeRoot, stateRoot)
    val orchA = new Orchestrator(spark, restartBackoffMs = 1)
    val orchB = new Orchestrator(spark, restartBackoffMs = 1)

    orchA.reconcile(Seq(parts("A")))
    orchB.reconcile(Seq(parts("B")))
    val got = spark.read.parquet(s"$sinkDir/out")
    assert(got.count() == 3)
    assert(got.columns.toSet == Set("id", "v", "site"), "transform ran on daemon A")
    assert(got.select("site").distinct().collect().map(_.getString(0)).toSeq == Seq("edge-1"))

    // daemon A ticks again (same source data → a second slice); daemon B's
    // cursor has acked slice 0, so the next run consumes ONLY slice 1 —
    // the sink doubles, not quadruples
    PipelineCompiler.run(spark, parts("A"))
    PipelineCompiler.run(spark, parts("B"))
    assert(spark.read.parquet(s"$sinkDir/out").count() == 6)

    // caught up: a B tick with nothing pending is a no-op (empty frame,
    // schema preserved), not a failure and not a duplicate delivery
    PipelineCompiler.run(spark, parts("B"))
    assert(spark.read.parquet(s"$sinkDir/out").count() == 6)
  }

  test("sink failure leaves the cursor unacked; the slice replays next round") {
    val srcDir = tmp("db_src2"); val sinkDir = tmp("db_sink2")
    val bridgeRoot = tmp("db_bridge2"); val stateRoot = tmp("db_state2")
    Seq((10L, "x"), (20L, "y")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(srcDir)

    val assign = Map("src" -> "A", "tag" -> "A", "dst" -> "B")
    // a sink whose parent path is a regular FILE → the write throws AFTER
    // the inbound section has served the slice
    val blocker = java.nio.file.Files.createTempFile("db_block", "").toString
    val bad = DaemonBridge.split(
      specFor(srcDir, s"$blocker/nope"), assign, bridgeRoot, stateRoot)
    val good = DaemonBridge.split(
      specFor(srcDir, s"$sinkDir/out"), assign, bridgeRoot, stateRoot)

    PipelineCompiler.run(spark, bad("A")) // publish slice 0
    intercept[Throwable] { PipelineCompiler.run(spark, bad("B")) }
    // cursor untouched → the fixed consumer half re-serves slice 0
    PipelineCompiler.run(spark, good("B"))
    assert(spark.read.parquet(s"$sinkDir/out").count() == 2,
      "unacked slice must replay exactly into the repaired sink")
  }

  test("three-daemon chain: each hop gets its own bridge, delivery composes") {
    val srcDir = tmp("db_src3"); val sinkDir = tmp("db_sink3")
    val bridgeRoot = tmp("db_bridge3w"); val stateRoot = tmp("db_state3w")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(srcDir)
    // src on A, transform on B, sink on C → two cuts, two bridges
    val parts = DaemonBridge.split(
      specFor(srcDir, s"$sinkDir/out"),
      Map("src" -> "A", "tag" -> "B", "dst" -> "C"), bridgeRoot, stateRoot)
    assert(parts.keySet == Set("A", "B", "C"))
    assert(parts("B").sections.map(_.name).sorted ==
      Seq("inbound_bridge", "outbound_bridge", "tagging"),
      "the middle daemon is inbound -> transform -> outbound")
    PipelineCompiler.run(spark, parts("A"))
    PipelineCompiler.run(spark, parts("B"))
    PipelineCompiler.run(spark, parts("C"))
    val got = spark.read.parquet(s"$sinkDir/out")
    assert(got.count() == 2 && got.columns.contains("site"),
      "two-hop bridged delivery must carry the middle daemon's transform")
  }

  test("inbound before any publish fails loudly (orchestrator backoff territory)") {
    val bridgeRoot = tmp("db_bridge3"); val stateRoot = tmp("db_state3")
    val parts = DaemonBridge.split(
      specFor("/unused", "/unused2"),
      Map("src" -> "A", "tag" -> "A", "dst" -> "B"), bridgeRoot, stateRoot)
    val e = intercept[IllegalArgumentException] {
      PipelineCompiler.run(spark, parts("B"))
    }
    assert(e.getMessage.contains("nothing published yet"))
  }
}
