package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins `dropDuplicatesWithinWatermark`'s bounded-state contract — the
  * 100 TB companion to the `st_dedup` query's plain `dropDuplicates`:
  * state is evicted once the event-time watermark passes a key's expiry
  * (event ts + delay), so state size tracks the ACTIVE key window, not
  * the full key history — at the cost of re-admitting a key that
  * reappears after eviction. That re-admit makes the output
  * order-dependent, which is why this is a spec with hand-controlled
  * batch boundaries rather than a DuckDB-oracle query. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream_dedup_against section: streaming survivors equal the batch operator's") {
    // the daily-crawl flow: signatures built once from the reference
    // corpus, a STREAM of incoming docs deduped against them per
    // micro-batch — survivors must be exactly what the batch operator
    // produces on the same input
    val root = java.nio.file.Files.createTempDirectory("graft_sda").toString
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val reference = docs.filter("doc_id % 3 = 0")
    val incoming = docs.filter("doc_id % 3 <> 0")
    graft.operators.NearDup.writeReferenceSignatures(reference, s"$root/sig")
    incoming.write.parquet(s"$root/in")
    val spec = graft.plans.PipelineSpec.fromJson(
      s"""{"sections":[
        {"id":"src","name":"stream_parquet_source","config":{
          "path":"$root/in","max_files_per_trigger":"4"}},
        {"id":"dd","name":"stream_dedup_against_destination","config":{
          "signatures":"$root/sig","path":"$root/out",
          "checkpoint":"$root/ckpt"}}],
        "edges":[["src","dd"]]}""")
    graft.plans.PipelineCompiler.run(spark, spec)
    val streamed = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    val batch = graft.operators.NearDup.dedupAgainstStored(incoming, s"$root/sig")
      .as[Long].collect().toSet
    spark.catalog.clearCache() // batch variant's session-managed cache
    assert(streamed == batch, s"stream/batch divergence: " +
      s"only-stream=${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
    assert(streamed.nonEmpty && streamed.size < incoming.count())
    // the streamed rows carry the full document schema, not just ids
    assert(spark.read.parquet(s"$root/out").columns.toSet == docs.columns.toSet)
    // the scoped cache lifecycle held: nothing persisted leaked past the run
    assert(spark.sharedState.cacheManager.isEmpty,
      "stream_dedup_against leaked a persisted frame")
    // REPLAY safety: a fresh checkpoint reprocesses the same input (the
    // crash-replay shape) — the idempotent append must not duplicate ids
    val spec2 = graft.plans.PipelineSpec.fromJson(
      s"""{"sections":[
        {"id":"src","name":"stream_parquet_source","config":{
          "path":"$root/in","max_files_per_trigger":"4"}},
        {"id":"dd","name":"stream_dedup_against_destination","config":{
          "signatures":"$root/sig","path":"$root/out",
          "checkpoint":"$root/ckpt2"}}],
        "edges":[["src","dd"]]}""")
    graft.plans.PipelineCompiler.run(spark, spec2)
    val after = spark.read.parquet(s"$root/out").select("doc_id").as[Long].collect()
    assert(after.length == after.distinct.length,
      "replayed batches duplicated survivors")
    assert(after.toSet == streamed)
  }

  test("absorb mode: later micro-batches dedup against earlier batches' survivors") {
    // the COMPLETE daily-crawl loop in one stream: batch 1's survivors
    // join the signature store, so batch 2's near-dup of a batch-1 doc
    // is dropped even though neither was in the original reference
    val root = java.nio.file.Files.createTempDirectory("graft_absorb").toString
    val seed = (1 to 30).map(i => s"s$i").mkString(" ")
    graft.operators.NearDup.writeReferenceSignatures(
      Seq((1L, seed)).toDF("doc_id", "text"), s"$root/sig")
    val docA = (1 to 30).map(i => s"a$i").mkString(" ")
    val docA2 = (1 to 30).map(i => if (i == 5) "X" else s"a$i").mkString(" ")
    // one FLAT parquet file per intended micro-batch (the stream source
    // does not recurse), ordered by mtime so batch order is pinned
    new java.io.File(s"$root/in").mkdirs()
    def writeFlat(name: String, mtime: Long,
                  rows: Seq[(Long, String)]): Unit = {
      val tmp = s"$root/tmp_$name"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$root/in/$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeFlat("f1", now - 60000, Seq((10L, docA)))
    writeFlat("f2", now, Seq((20L, docA2),
      (21L, "fresh words entirely new today")))
    val spec = graft.plans.PipelineSpec.fromJson(
      s"""{"sections":[
        {"id":"src","name":"stream_parquet_source","config":{
          "path":"$root/in","glob":"*.parquet",
          "max_files_per_trigger":"1"}},
        {"id":"dd","name":"stream_dedup_against_destination","config":{
          "signatures":"$root/sig","path":"$root/out",
          "checkpoint":"$root/ckpt","absorb":"true"}}],
        "edges":[["src","dd"]]}""")
    graft.plans.PipelineCompiler.run(spark, spec)
    val out = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    // 10 survived batch 1 and was absorbed; 20 (its near-dup) was dropped
    // in batch 2; 21 is genuinely fresh
    assert(out == Set(10L, 21L), s"got $out")
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("index_path mode: the v2 signature index serves and absorbs in-stream") {
    // same daily-crawl loop as the absorb test, served from the
    // partition-pruned v2 index (dedupAgainstIndexScoped /
    // absorbIntoIndex) — batch 1's survivor is absorbed, batch 2's
    // near-dup of it is dropped, fresh content passes
    val root = java.nio.file.Files.createTempDirectory("graft_absorb_idx").toString
    val seed = (1 to 30).map(i => s"s$i").mkString(" ")
    graft.operators.NearDup.writeSignatureIndex(
      Seq((1L, seed)).toDF("doc_id", "text"), s"$root/idx")
    val docA = (1 to 30).map(i => s"a$i").mkString(" ")
    val docA2 = (1 to 30).map(i => if (i == 5) "X" else s"a$i").mkString(" ")
    new java.io.File(s"$root/in").mkdirs()
    def writeFlat(name: String, mtime: Long,
                  rows: Seq[(Long, String)]): Unit = {
      val tmp = s"$root/tmp_$name"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$root/in/$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeFlat("f1", now - 60000, Seq((10L, docA), (11L, seed)))
    writeFlat("f2", now, Seq((20L, docA2),
      (21L, "fresh words entirely new today")))
    val spec = graft.plans.PipelineSpec.fromJson(
      s"""{"sections":[
        {"id":"src","name":"stream_parquet_source","config":{
          "path":"$root/in","glob":"*.parquet",
          "max_files_per_trigger":"1"}},
        {"id":"dd","name":"stream_dedup_against_destination","config":{
          "index_path":"$root/idx","path":"$root/out",
          "checkpoint":"$root/ckpt","absorb":"true"}}],
        "edges":[["src","dd"]]}""")
    graft.plans.PipelineCompiler.run(spark, spec)
    val out = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    // 11 dups the original reference; 10 survives batch 1 and absorbs;
    // 20 (near-dup of 10) drops in batch 2; 21 is fresh
    assert(out == Set(10L, 21L), s"got $out")
    assert(spark.sharedState.cacheManager.isEmpty,
      "index-mode stream leaked a persisted frame")
  }

  test("watermarked dedup suppresses within the horizon, re-admits after eviction") {
    val root = java.nio.file.Files.createTempDirectory("graft_streamdedup").toString
    def write(sub: String, rows: Seq[(String, String)]): Unit =
      rows.map { case (k, ts) => (k, java.sql.Timestamp.valueOf(ts)) }
        .toDF("key", "ts").coalesce(1).write.parquet(s"$root/in/$sub")
    // each run() drains only the files that appeared since the last run —
    // one run = one micro-batch, so watermark advancement is deterministic
    def run(): Unit = {
      val schema = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$root/in").schema
      val deduped = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(s"$root/in")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("key")
      val w = deduped.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$root/out")
        }
      StreamingPipelines.runToCompletion(w)
    }
    write("a", Seq("k1" -> "2024-01-01 10:00:00", "k2" -> "2024-01-01 10:00:30"))
    run()
    // k1 again, within the 1h horizon → suppressed; k3 at 13:00 pushes the
    // watermark to 12:00 at this batch's end
    write("b", Seq("k1" -> "2024-01-01 10:05:00", "k3" -> "2024-01-01 13:00:00"))
    run()
    // k1's state expired at 11:00 (< the 12:00 watermark), so it was
    // evicted — the key is re-admitted and emitted AGAIN
    write("c", Seq("k1" -> "2024-01-01 13:05:00"))
    run()
    val out = spark.read.parquet(s"$root/out").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString)).toSet
    assert(out == Set(
      ("k1", "2024-01-01 10:00:00.0"),
      ("k2", "2024-01-01 10:00:30.0"),
      ("k3", "2024-01-01 13:00:00.0"),
      ("k1", "2024-01-01 13:05:00.0")),
      s"unexpected output: $out")
  }
}
