package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the layout-portable streaming fix (commit 0a59210):
  * streaming file sources require a DIRECTORY path, so single-FILE
  * tables (the driver's testdata layout) stream the parent dir with a
  * glob — but a Spark/lake-written table is a directory of part files
  * where that glob matches nothing and the stream silently reads ZERO
  * rows (st_novelty returned an empty frame at the sf1 rehearsal twin).
  * [[Tables.streamTable]] must read BOTH layouts. */
class TablesStreamLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def streamCount(dir: String, table: String,
                          schema: org.apache.spark.sql.types.StructType,
                          name: String): Long = {
    val q = Tables.streamTable(spark, dir, table, schema)
      .groupBy().count()
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table(name).head().getLong(0)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    n
  }

  test("streamTable reads single-file AND directory table layouts") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val df = (1L to 37L).map(i => (i, s"v$i")).toDF("id", "v")
    // single-file layout (driver testdata shape): one bare parquet FILE
    // named <table>.parquet in the dir — write via a scratch dir + move
    val scratch = java.nio.file.Files.createTempDirectory("graft_layout_w")
    df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val part = new java.io.File(scratch.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(root, "filetab.parquet"))
    // directory layout (Spark/lake-written shape): <table>.parquet is a
    // DIRECTORY of part files
    df.repartition(3).write.mode("overwrite")
      .parquet(s"$root/dirtab.parquet")
    val schema = df.schema
    assert(streamCount(root, "filetab.parquet", schema, "lay_file") == 37L,
      "single-file table must stream via the parent-dir glob")
    assert(streamCount(root, "dirtab.parquet", schema, "lay_dir") == 37L,
      "directory table must stream directly (the glob would match nothing)")
  }
}
