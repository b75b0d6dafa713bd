package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Failure injection shared with the foreachBatch closure (driver-side). */
object SupervisorFailFlag {
  @volatile var armed = false
}

class StreamingSupervisorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("failed streaming query restarts with backoff and resumes from checkpoint") {
    val root = java.nio.file.Files.createTempDirectory("graft_supervise").toString
    // two input files, one per micro-batch
    Seq(1, 2, 3).toDF("v").coalesce(1).write.parquet(s"$root/in/a")
    Seq(4, 5, 6).toDF("v").coalesce(1).write.parquet(s"$root/in/b")
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(s"$root/in").schema
    val ckpt = s"$root/ckpt"
    val out = s"$root/out"

    SupervisorFailFlag.armed = true
    val sup = new StreamingSupervisor(spark, restartBackoffMs = 100, maxRestarts = 3)
    try {
      val handle = sup.supervise { () =>
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .option("recursiveFileLookup", "true")
          .parquet(s"$root/in")
        StreamingPipelines.ackSink(stream, ckpt) { (batch, _) =>
          val vals = batch.select("v").as[Int].collect().sorted
          // kill the query ON the batch holding 4..6, once, BEFORE writing
          if (SupervisorFailFlag.armed && vals.contains(4)) {
            SupervisorFailFlag.armed = false
            throw new RuntimeException("injected mid-run failure")
          }
          batch.write.mode("append").parquet(s"$out/data")
        }.trigger(Trigger.AvailableNow()).start()
      }
      handle.await(timeoutMs = 120000)
      assert(handle.restartCount == 1, "exactly one restart expected")
      // every row exactly once: the committed epoch (first file) was NOT
      // reprocessed after the restart; the failed epoch was replayed once
      val got = spark.read.parquet(s"$out/data").as[Int].collect().sorted.toSeq
      assert(got == Seq(1, 2, 3, 4, 5, 6))
    } finally sup.close()
  }

  test("restarts are bounded: a permanently failing query surfaces its error") {
    val root = java.nio.file.Files.createTempDirectory("graft_supervise2").toString
    Seq(1).toDF("v").write.parquet(s"$root/in")
    val schema = spark.read.parquet(s"$root/in").schema
    val sup = new StreamingSupervisor(spark, restartBackoffMs = 50, maxRestarts = 2)
    try {
      val handle = sup.supervise { () =>
        val stream = spark.readStream.schema(schema).parquet(s"$root/in")
        StreamingPipelines.ackSink(stream, s"$root/ckpt") { (_, _) =>
          throw new RuntimeException("always fails")
        }.trigger(Trigger.AvailableNow()).start()
      }
      val e = intercept[RuntimeException] { handle.await(timeoutMs = 120000) }
      assert(e.getMessage.contains("after 2 restarts"))
      assert(handle.restartCount == 3) // initial + 2 restarts all failed
    } finally sup.close()
  }
}
