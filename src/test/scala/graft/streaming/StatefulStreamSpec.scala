package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Custom keyed state via flatMapGroupsWithState — the streaming analog of
  * the reference's per-section state, at per-KEY granularity (running
  * per-user counters surviving across micro-batches). */
class StatefulStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flatMapGroupsWithState keeps running per-user event counts across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state_stream").toString
    // two input files → the file source can deliver multiple batches;
    // state must carry counts across them
    Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("user_id", "ev")
      .write.parquet(s"$dir/in/f1")
    Seq((1L, "c"), (3L, "a")).toDF("user_id", "ev")
      .write.parquet(s"$dir/in/f2")

    val schema = spark.read.parquet(s"$dir/in/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")

    val counts = stream.as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, String)], state: GroupState[Long]) => {
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator.single((user, total))
        })
      .toDF("user_id", "running_count")

    val q = counts.writeStream.format("memory").queryName("state_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // final running count per user = total events seen
    val finals = spark.table("state_stream")
      .groupBy($"user_id").agg(max($"running_count").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finals == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }
}
