package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The novelty daily-crawl loop (`stream_novelty_absorb_destination`):
  * score batch N against the store AS OF BEFORE batch N, land the
  * scores idempotently, THEN absorb batch N — and the at-least-once
  * replay contract at both crash sites around the absorb: no doc
  * double-absorbs, and a replayed batch's post-absorb ~0 re-scores
  * never replace the pre-absorb truth. */
class NoveltyAbsorbSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one FLAT parquet file per intended micro-batch, mtime-ordered (the
  // StreamingDedupSpec recipe — the stream source does not recurse)
  private def writeFlat(root: String, name: String, mtime: Long,
                        rows: Seq[(Long, String)]): Unit = {
    new java.io.File(s"$root/in").mkdirs()
    val tmp = s"$root/tmp_$name"
    rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$root/in/$name.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    dst.setLastModified(mtime)
  }

  private def specJson(root: String, extra: String = ""): String =
    s"""{"sections":[
      {"id":"src","name":"stream_parquet_source","config":{
        "path":"$root/in","glob":"*.parquet","max_files_per_trigger":"1"}},
      {"id":"nv","name":"stream_novelty_absorb_destination","config":{
        "signatures":"$root/sig","path":"$root/scores",
        "checkpoint":"$root/ckpt","restart_backoff_ms":"100"$extra}}],
      "edges":[["src","nv"]]}"""

  private def scoresOf(root: String): Map[Long, Long] =
    spark.read.parquet(s"$root/scores")
      .select("doc_id", "novelty_micro").as[(Long, Long)].collect().toMap

  private val seed = (1 to 40).map(i => s"s$i").mkString(" ")
  private val docA = (1 to 40).map(i => s"a$i").mkString(" ")
  // docA with one word changed — near-zero novelty ONLY once docA absorbed
  private val docA2 = (1 to 40).map(i => if (i == 5) "X" else s"a$i").mkString(" ")
  private val fresh = (1 to 40).map(i => s"f$i").mkString(" ")

  test("score-then-absorb: batch N scores against the pre-N store; " +
    "batch N+1 sees batch N as reference") {
    val root = java.nio.file.Files.createTempDirectory("graft_nvab").toString
    graft.operators.NearDup.writeReferenceSignatures(
      Seq((1L, seed)).toDF("doc_id", "text"), s"$root/sig")
    val now = System.currentTimeMillis()
    writeFlat(root, "f1", now - 60000, Seq((10L, docA)))
    writeFlat(root, "f2", now, Seq((20L, docA2), (21L, fresh)))
    graft.plans.PipelineCompiler.run(spark,
      graft.plans.PipelineSpec.fromJson(specJson(root)))
    val sc = scoresOf(root)
    // docA vs the seed-only store: fully novel
    assert(sc(10L) > 900000L, s"doc 10 should be novel, got ${sc(10L)}")
    // docA2 scored AFTER docA absorbed: nearly everything already seen
    assert(sc(20L) < 200000L, s"doc 20 should be near-dup of absorbed 10, " +
      s"got ${sc(20L)}")
    assert(sc(21L) > 900000L, s"doc 21 is fresh, got ${sc(21L)}")
    // the store absorbed every batch exactly once (exact guard distinct)
    val ths = spark.read.parquet(s"$root/sig/exact").select("_th")
      .as[String].collect()
    assert(ths.length == ths.distinct.length, "duplicate exact-guard rows")
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  private def crashReplayAt(site: String): Unit = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_nvcr").toString
    graft.operators.NearDup.writeReferenceSignatures(
      Seq((1L, seed)).toDF("doc_id", "text"), s"$root/sig")
    writeFlat(root, "f1", System.currentTimeMillis(), Seq((10L, docA)))
    @volatile var armed = true
    graft.plans.Failpoints.arm(site, () =>
      if (armed) { armed = false
        throw new RuntimeException(s"injected crash at $site") })
    try graft.plans.PipelineCompiler.run(spark,
      graft.plans.PipelineSpec.fromJson(specJson(root)))
    finally graft.plans.Failpoints.disarm(site)
    // after the supervised replay converges:
    val rows = spark.read.parquet(s"$root/scores")
      .select("doc_id", "novelty_micro").as[(Long, Long)].collect()
    // exactly ONE score row, and it is the PRE-absorb truth (novel) —
    // at the post_absorb site the replay re-scored ~0 against a store
    // already holding docA, and the idempotent append discarded it
    assert(rows.length == 1, s"replay duplicated or lost scores: ${rows.toSeq}")
    assert(rows.head._2 > 900000L,
      s"replay overwrote the pre-absorb score at $site: ${rows.head}")
    // no double-absorb: one exact-guard row per distinct text (seed+docA)
    val ths = spark.read.parquet(s"$root/sig/exact").select("_th")
      .as[String].collect()
    assert(ths.length == ths.distinct.length && ths.length == 2,
      s"store double-absorbed after crash at $site: ${ths.length} rows")
    // and the absorbed store actually serves: the same text re-scored
    // now is ~0 novel
    val re = graft.operators.NearDup.noveltyAgainstStored(
      Seq((99L, docA)).toDF("doc_id", "text"), s"$root/sig")
      .select("novelty_micro").as[Long].head()
    assert(re == 0L, s"absorb did not land: re-score $re")
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("kill BETWEEN score and absorb: replay converges, no double-absorb") {
    crashReplayAt("stream_novelty_absorb:pre_absorb")
  }

  test("kill AFTER absorb (before epoch commit): replayed ~0 re-scores are " +
    "discarded by the idempotent append") {
    crashReplayAt("stream_novelty_absorb:post_absorb")
  }
}
