package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** The stage-and-COPY sinks are statement-sequence contracts
  * (`sections/snowflake/src/destination.rs:126-177`,
  * `sections/redshift_loader/src/destination.rs:80-101`): a recorder
  * stands in for the warehouse and the EXACT order is asserted. */
class WarehouseSinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private class Recorder extends WarehouseSinks.SqlExec {
    val stmts = ArrayBuffer[String]()
    override def exec(sql: String): Unit = stmts += sql
  }

  test("snowflake: CREATE -> PUT -> FILE FORMAT -> COPY INTO, per origin") {
    val rec = new Recorder
    val stage = java.nio.file.Files.createTempDirectory("sfstage").toString
    val df = Seq(("t one", 1L, "a"), ("t one", 2L, "b"), ("other.t", 3L, "c"))
      .toDF("origin", "id", "name")
    WarehouseSinks.snowflake(df, rec, stage)
    // origins route alphabetically; table names substitute [ /:.] -> _
    val expected = Seq(
      "CREATE TABLE IF NOT EXISTS other_t(id NUMBER, name VARCHAR);",
      s"PUT file://$stage/other_t/*.parquet @%other_t;",
      "CREATE OR REPLACE TEMPORARY FILE FORMAT CUSTOM_PARQUET_FORMAT " +
        "TYPE = PARQUET COMPRESSION = AUTO TRIM_SPACE = TRUE " +
        "REPLACE_INVALID_CHARACTERS = TRUE BINARY_AS_TEXT = FALSE " +
        "USE_LOGICAL_TYPE = TRUE;",
      "COPY INTO other_t FILE_FORMAT = CUSTOM_PARQUET_FORMAT " +
        "PURGE = TRUE MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE;",
      "CREATE TABLE IF NOT EXISTS t_one(id NUMBER, name VARCHAR);",
      s"PUT file://$stage/t_one/*.parquet @%t_one;",
      "CREATE OR REPLACE TEMPORARY FILE FORMAT CUSTOM_PARQUET_FORMAT " +
        "TYPE = PARQUET COMPRESSION = AUTO TRIM_SPACE = TRUE " +
        "REPLACE_INVALID_CHARACTERS = TRUE BINARY_AS_TEXT = FALSE " +
        "USE_LOGICAL_TYPE = TRUE;",
      "COPY INTO t_one FILE_FORMAT = CUSTOM_PARQUET_FORMAT " +
        "PURGE = TRUE MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE;")
    assert(rec.stmts.toSeq == expected)
    // the stage artifact is real parquet carrying the origin's slice
    val staged = spark.read.parquet(s"$stage/t_one")
    assert(staged.count() == 2 &&
      staged.columns.toSeq == Seq("id", "name"))
  }

  test("snowflake truncate inserts TRUNCATE before COPY INTO") {
    val rec = new Recorder
    val stage = java.nio.file.Files.createTempDirectory("sfstage").toString
    val df = Seq(("t", 1L)).toDF("origin", "id")
    WarehouseSinks.snowflake(df, rec, stage, truncate = true)
    val kinds = rec.stmts.map(_.takeWhile(_ != ' ')).toSeq
    assert(kinds == Seq("CREATE", "PUT", "CREATE", "TRUNCATE", "COPY"))
    assert(rec.stmts(3) == "TRUNCATE TABLE t;")
  }

  test("snowflake external stage: no PUT, COPY FROM @stage/<table>/ (cluster path)") {
    val rec = new Recorder
    val stage = java.nio.file.Files.createTempDirectory("sfext").toString
    val df = Seq(("t", 1L, "a"), ("t", 2L, "b")).toDF("origin", "id", "name")
    WarehouseSinks.snowflake(df, rec, stage, truncate = true,
      externalStage = Some("graft_ext"))
    val kinds = rec.stmts.map(_.takeWhile(_ != ' ')).toSeq
    assert(kinds == Seq("CREATE", "CREATE", "TRUNCATE", "COPY"),
      s"external stage must not PUT: ${rec.stmts}")
    assert(rec.stmts.last ==
      "COPY INTO t FROM @graft_ext/t/ " +
      "FILE_FORMAT = CUSTOM_PARQUET_FORMAT PURGE = TRUE " +
      "PATTERN = '.*[.]parquet' " +
      "MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE;")
    // executors still stage the slice (to the path the external stage
    // points at) — written via the ordinary distributed parquet path
    assert(spark.read.parquet(s"$stage/t").count() == 2)
  }

  test("snowflake rejects unmappable column types BEFORE staging (Any parity)") {
    val rec = new Recorder
    val stage = java.nio.file.Files.createTempDirectory("sfstage").toString
    val df = Seq(("t", 1L)).toDF("origin", "id")
      .withColumn("bad", lit(0).cast("interval day")) // DayTimeIntervalType
    val e = intercept[IllegalArgumentException] {
      WarehouseSinks.snowflake(df, rec, stage)
    }
    assert(e.getMessage.contains("can't handle column type"))
    assert(rec.stmts.isEmpty, "no statement may run after a rejected schema")
  }

  test("snowflake type mapping follows the reference table") {
    import org.apache.spark.sql.types._
    assert(WarehouseSinks.snowflakeType(LongType) == "NUMBER")
    assert(WarehouseSinks.snowflakeType(DoubleType) == "Float")
    assert(WarehouseSinks.snowflakeType(DecimalType(12, 2)) == "NUMBER(36, 2)")
    assert(WarehouseSinks.snowflakeType(StringType) == "VARCHAR")
    assert(WarehouseSinks.snowflakeType(BinaryType) == "BINARY")
    assert(WarehouseSinks.snowflakeType(TimestampType) == "TIMESTAMP")
    assert(WarehouseSinks.snowflakeType(DateType) == "DATE")
    assert(WarehouseSinks.snowflakeType(ArrayType(LongType)) == "ARRAY")
    assert(WarehouseSinks.snowflakeType(
      StructType(Seq(StructField("x", LongType)))) == "OBJECT")
  }

  test("redshift: one COPY per path row, in order, quotes escaped") {
    val rec = new Recorder
    val df = Seq(
      ("tbl", "s3://b/part-0.csv"),
      ("tbl", "s3://b/it's.csv"))
      .toDF("origin", "path").coalesce(1)
    WarehouseSinks.redshiftLoad(df, rec, iamRole = "arn:aws:iam::1:role/r",
      region = "us-east-1", ignoreHeader = true)
    assert(rec.stmts.toSeq == Seq(
      """COPY "tbl" FROM 's3://b/part-0.csv' iam_role 'arn:aws:iam::1:role/r' region 'us-east-1' CSV IGNOREHEADER 1""",
      """COPY "tbl" FROM 's3://b/it''s.csv' iam_role 'arn:aws:iam::1:role/r' region 'us-east-1' CSV IGNOREHEADER 1"""))
  }

  test("redshift rejects unknown formats and frames without a path column") {
    val rec = new Recorder
    val df = Seq(("t", "p")).toDF("origin", "path")
    intercept[IllegalArgumentException] {
      WarehouseSinks.redshiftLoad(df, rec, "r", "us", dataFormat = "ORC")
    }
    intercept[IllegalArgumentException] {
      WarehouseSinks.redshiftLoad(Seq(("t", "x")).toDF("origin", "notpath"),
        rec, "r", "us")
    }
  }

  test("snowflake_destination section drives the MemJdbc statement journal") {
    import graft.sources.memjdbc.{MemDb, MemJdbc}
    MemJdbc.register
    MemDb.reset()
    val stage = java.nio.file.Files.createTempDirectory("sfstage").toString
    val spec = graft.plans.PipelineSpec.fromJson(s"""{"sections":[
      {"id":"src","name":"parquet_source",
       "config":{"path":"${TestSpark.sf}/region.parquet"}},
      {"id":"org","name":"tagging","config":{"column":"origin","text":"wh t"}},
      {"id":"sink","name":"snowflake_destination",
       "config":{"url":"${MemJdbc.UrlPrefix}wh","stage_dir":"$stage"}}],
      "edges":[["src","org"],["org","sink"]]}""")
    graft.plans.PipelineCompiler.run(spark, spec)
    val j = MemDb.journal.toSeq
    assert(j.exists(_.startsWith("CREATE TABLE IF NOT EXISTS wh_t")))
    assert(j.exists(_.startsWith(s"PUT file://$stage/wh_t")))
    assert(j.last.startsWith("COPY INTO wh_t"))
  }
}
