package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish star schema plus the
  * `events` / `documents` / `embeddings` tables (see /root/repo/TESTDATA.md).
  *
  * Every loader is a plain parquet scan — filters and projections written
  * on top of these compile to `PushedFilters`/`ReadSchema` at the file
  * source, so the same code paths scale from sf0.001 to a 100 TB lake:
  * nothing here materializes or collects.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Stream a table regardless of its on-disk layout. Streaming file
    * sources REQUIRE a directory path ("Option 'basePath' must be a
    * directory"): the driver's testdata ships single-FILE tables, so
    * those stream the parent dir with a `pathGlobFilter` — but a
    * Spark/lake-written table is a DIRECTORY of part files, where that
    * glob matches nothing and the stream silently sees zero files.
    * Pick by what is actually on disk. */
  def streamTable(spark: SparkSession, dir: String, table: String,
                  schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.getFileStatus(p).isDirectory)
      spark.readStream.schema(schema).parquet(p.toString)
    else
      spark.readStream.schema(schema)
        .option("pathGlobFilter", table).parquet(dir)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The driver has shipped events.parquet with `ts` as TIMESTAMP(NANOS)
    * (which Spark's parquet reader only accepts as a raw long via the
    * legacy conf) and, since round 10, as TIMESTAMP(MICROS) (which Spark
    * reads as TIMESTAMP_NTZ). All readers of `events` — batch AND
    * streaming — must normalize through [[normalizeEventsTs]] so the next
    * physical-format drift has a single choke point. Every branch lands on
    * session-local TimestampType at microsecond precision, which with the
    * UTC session timezone used everywhere is value-identical to DuckDB's
    * reading of the same file. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long: floor-divide ns→µs like DuckDB does
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unexpected type $other — update Tables.normalizeEventsTs")
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    // Harmless when the file is already micros; required to read nanos files.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` pipelines (our
    * equivalent of the reference's SQL pushdown surface) can name them. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
