package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** JSON spec → STREAMING pipeline: the same spec language compiles to a
  * checkpointed Structured Streaming job (SURVEY §7.2 step 7). */
class StreamingSpecCompileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spec compiles to a streaming source → transform → ack sink, with checkpoint replay protection") {
    val tmp = Files.createTempDirectory("graft_stream_spec").toString
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .write.parquet(s"$tmp/in")
    val specJson =
      s"""{"sections":[
        {"id":"src","name":"stream_parquet_source","config":{"path":"$tmp/in"}},
        {"id":"tag","name":"tagging","config":{"column":"mode","text":"streamed"}},
        {"id":"sink","name":"stream_parquet_destination",
         "config":{"path":"$tmp/out","checkpoint":"$tmp/ckpt"}}],
        "edges":[["src","tag"],["tag","sink"]]}"""
    val spec = PipelineSpec.fromJson(specJson)
    PipelineCompiler.run(spark, spec)
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == 3)
    assert(out.select("mode").distinct().as[String].head() == "streamed")
    // second run, same checkpoint, no new files → no duplicates (ack/offset
    // contract: processed files are not replayed)
    PipelineCompiler.run(spark, spec)
    assert(spark.read.parquet(s"$tmp/out").count() == 3)
    // new file arrives → only it is processed
    Seq((4, "d")).toDF("id", "v").write.mode("append").parquet(s"$tmp/in")
    PipelineCompiler.run(spark, spec)
    assert(spark.read.parquet(s"$tmp/out").count() == 4)
  }

  test("schema drift between runs widens the stream schema without replay") {
    val tmp = Files.createTempDirectory("graft_drift").toString
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.parquet(s"$tmp/in")
    def specJson(policy: String) =
      s"""{"sections":[
        {"id":"src","name":"stream_parquet_source",
         "config":{"path":"$tmp/in","schema_record":"$tmp/ckpt",
                   "on_schema_drift":"$policy"}},
        {"id":"sink","name":"stream_parquet_destination",
         "config":{"path":"$tmp/out","checkpoint":"$tmp/ckpt"}}],
        "edges":[["src","sink"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(specJson("widen")))
    assert(spark.read.parquet(s"$tmp/out").count() == 2)
    // a new file arrives with an ADDED column
    Seq((3, "c", 9.5)).toDF("id", "v", "extra")
      .write.mode("append").parquet(s"$tmp/in")
    PipelineCompiler.run(spark, PipelineSpec.fromJson(specJson("widen")))
    val out = spark.read.option("mergeSchema", "true").parquet(s"$tmp/out")
    assert(out.count() == 3, "drift must not replay processed files")
    assert(out.columns.contains("extra"))
    assert(out.filter($"id" === 3).select("extra").as[Double].head() == 9.5)
    // fail policy: the NEXT drift raises (recorded schema now has `extra`)
    Seq((4, "d", 1.0, true)).toDF("id", "v", "extra", "flag")
      .write.mode("append").parquet(s"$tmp/in")
    val e = intercept[IllegalStateException] {
      PipelineCompiler.run(spark, PipelineSpec.fromJson(specJson("fail")))
    }
    assert(e.getMessage.contains("schema drift"))
  }

  test("widen rejects a same-column type change") {
    import org.apache.spark.sql.types._
    val old = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val nu = StructType(Seq(StructField("id", StringType), StructField("v", StringType)))
    val e = intercept[IllegalStateException] { SchemaDrift.widen(old, nu) }
    assert(e.getMessage.contains("not widenable"))
    // pure additions/removals widen fine, everything nullable
    val added = StructType(old.fields :+ StructField("extra", DoubleType))
    val w = SchemaDrift.widen(old, added)
    assert(w.fieldNames.toSeq == Seq("id", "v", "extra"))
    val removedSide = StructType(Seq(StructField("id", LongType)))
    val w2 = SchemaDrift.widen(old, removedSide)
    assert(w2.fieldNames.toSeq == Seq("id", "v")) // dropped column kept, nullable
    assert(w2.forall(_.nullable))
  }

  test("spec-level route_by_origin fans the stream out to per-origin trees") {
    val tmp = Files.createTempDirectory("graft_stream_fan").toString
    Seq(("t1", 1), ("t2", 2), ("t1", 3)).toDF("origin", "v")
      .write.parquet(s"$tmp/in")
    val specJson =
      s"""{"sections":[
        {"id":"src","name":"stream_parquet_source","config":{"path":"$tmp/in"}},
        {"id":"sink","name":"stream_parquet_destination",
         "config":{"path":"$tmp/out","checkpoint":"$tmp/ckpt",
                   "route_by_origin":"true"}}],
        "edges":[["src","sink"]]}"""
    val spec = PipelineSpec.fromJson(specJson)
    PipelineCompiler.run(spark, spec)
    assert(spark.read.parquet(s"$tmp/out/t1").select("v")
      .as[Int].collect().sorted.toSeq == Seq(1, 3))
    assert(spark.read.parquet(s"$tmp/out/t2").select("v")
      .as[Int].collect().toSeq == Seq(2))
    // replay protection holds through the fan-out path
    PipelineCompiler.run(spark, spec)
    assert(spark.read.parquet(s"$tmp/out/t1").count() == 2)
  }

  test("streaming corpus-prep pipeline: mix -> chunk sections on a stream, batch parity") {
    val tmp = Files.createTempDirectory("graft_stream_corpus").toString
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select("doc_id", "text", "lang")
    docs.write.parquet(s"$tmp/in")
    // the SAME declarative sections that run in batch compile into a
    // checkpointed streaming job: micro-batched crawl ingestion that mixes
    // domains and chunks for embedding on the fly
    val specJson =
      s"""{"sections":[
        {"id":"src","name":"stream_parquet_source","config":{"path":"$tmp/in"}},
        {"id":"mix","name":"mix_weighted","config":{
          "rates":"en:1.0,de:0.5,es:0.0,fr:0.5,zh:0.1"}},
        {"id":"back","name":"sql","config":{
          "query":"SELECT i.doc_id, d.text FROM input i JOIN parquet.`$tmp/in` d USING (doc_id)"}},
        {"id":"ch","name":"chunk_tokens","config":{"window":"32","stride":"16"}},
        {"id":"sink","name":"stream_parquet_destination",
         "config":{"path":"$tmp/out","checkpoint":"$tmp/ckpt"}}],
        "edges":[["src","mix"],["mix","back"],["back","ch"],["ch","sink"]]}"""
    PipelineCompiler.run(spark, PipelineSpec.fromJson(specJson))
    val streamed = spark.read.parquet(s"$tmp/out")
      .orderBy("doc_id", "chunk_idx").collect()
    val batch = graft.operators.Corpus.chunkTokens(
        graft.operators.Corpus.mixWeighted(docs,
            Seq("en" -> 1.0, "de" -> 0.5, "es" -> 0.0, "fr" -> 0.5, "zh" -> 0.1))
          .join(docs.select("doc_id", "text"), "doc_id"),
        window = 32, stride = 16)
      .orderBy("doc_id", "chunk_idx").collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }
}
