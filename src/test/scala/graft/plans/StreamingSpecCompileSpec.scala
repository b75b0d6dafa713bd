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
}
