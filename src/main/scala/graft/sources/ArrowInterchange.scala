package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Arrow IPC FILE interchange — the reference's wire format made a real
  * source/sink. The reference bridges section dataframes ⇄ Arrow record
  * batches (`formats/arrow_msg/src/lib.rs:232-578` wraps a RecordBatch
  * as its DataFrame; `:930-1259` builds typed arrays back; `ArrowMsg`
  * carries a vec of batches between daemons `:55-106`). Spark's OWN
  * Arrow machinery is internal (pandas UDF transport), so the operator-
  * facing half — "hand a corpus to an Arrow-speaking system as `.arrow`
  * shards, or ingest one" — is built here on the Arrow Java library the
  * Spark distribution already ships.
  *
  * Layout mirrors the parquet/ORC shard discipline: ONE `.arrow` file
  * per partition, each holding `batchRows`-row record batches (bounded
  * writer memory — a 10 GB partition never materializes as one batch).
  * Reading parallelizes one task per shard and streams batch-by-batch.
  *
  * Types: long/int/double/float/string/boolean/binary, timestamp
  * (micros, UTC — Spark's own physical resolution, lossless), and
  * list&lt;float32|float64&gt; (embedding columns). Nulls round-trip at both
  * row and list-element level.
  */
object ArrowInterchange {

  private def arrowField(f: StructField): Field = {
    def prim(dt: DataType): ArrowType = dt match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType =>
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType =>
        new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BooleanType => ArrowType.Bool.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case other => throw new IllegalArgumentException(
        s"arrow interchange: unsupported type $other")
    }
    f.dataType match {
      case ArrayType(et @ (FloatType | DoubleType), _) =>
        new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
          Seq(new Field("item", FieldType.nullable(prim(et)), null)).asJava)
      case dt =>
        new Field(f.name, FieldType.nullable(prim(dt)), null)
    }
  }

  private def arrowSchema(s: StructType): ArrowSchema =
    new ArrowSchema(s.fields.map(arrowField).toSeq.asJava)

  private def sparkField(f: Field): StructField = {
    def prim(t: ArrowType): DataType = t match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case fp: ArrowType.FloatingPoint
          if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case fp: ArrowType.FloatingPoint
          if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Binary => BinaryType
      case _: ArrowType.Timestamp => TimestampType
      case other => throw new IllegalArgumentException(
        s"arrow interchange: unsupported arrow type $other")
    }
    f.getType match {
      case _: ArrowType.List =>
        StructField(f.getName,
          ArrayType(prim(f.getChildren.get(0).getType)), nullable = true)
      case t => StructField(f.getName, prim(t), nullable = true)
    }
  }

  private def microsOf(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private def tsFromMicros(micros: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  /** Write `df` as one `.arrow` IPC file per partition under `dir` —
    * executor-side, batch-bounded memory.
    *
    * `dir` must be a path every executor AND the reader can see — a
    * shared filesystem (NFS, fuse mount) or local mode. On a multi-node
    * cluster with executor-local disks the shards land on different
    * machines and [[readArrow]]'s driver-side listing would silently
    * miss them; that topology needs the parquet/ORC sinks (which go
    * through Hadoop committers) instead. Within that contract the write
    * is torn-shard-safe: each task writes `.part-NNNNN.<attempt>.tmp`
    * and ATOMICALLY renames to `part-NNNNN.arrow` on success, so a
    * retried or speculatively-executed task never exposes a
    * half-written file and the last successful attempt wins whole. */
  def writeArrow(df: DataFrame, dir: String, batchRows: Int = 4096): Unit = {
    require(batchRows > 0, "batchRows must be positive")
    val schema = df.schema
    schema.fields.foreach(arrowField) // fail FAST on unsupported types
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val fin = java.nio.file.Paths.get(
          s"$dir/part-${"%05d".format(pid)}.arrow")
        // attempt id in the temp name: two live attempts of the same
        // partition (speculation) must never interleave into one fd
        val tmp = fin.resolveSibling(
          s".part-${"%05d".format(pid)}.${tc.taskAttemptId()}.tmp")
        val alloc = new RootAllocator()
        val root = VectorSchemaRoot.create(arrowSchema(schema), alloc)
        val out = new java.io.FileOutputStream(tmp.toFile)
        val writer = new ArrowFileWriter(root, null, out.getChannel)
        var ok = false
        try {
          writer.start()
          while (it.hasNext) {
            root.allocateNew()
            var n = 0
            while (it.hasNext && n < batchRows) {
              val row = it.next()
              var c = 0
              while (c < schema.length) {
                setValue(root.getVector(c), schema.fields(c).dataType, n, row, c)
                c += 1
              }
              n += 1
            }
            root.setRowCount(n)
            writer.writeBatch()
          }
          writer.end()
          ok = true
        } finally {
          writer.close(); out.close(); root.close(); alloc.close()
          if (ok)
            java.nio.file.Files.move(tmp, fin,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          else java.nio.file.Files.deleteIfExists(tmp)
        }
      }
    }
  }

  private def setValue(vec: FieldVector, dt: DataType, i: Int,
                       row: Row, c: Int): Unit =
    if (row.isNullAt(c)) vec.setNull(i)
    else dt match {
      case LongType => vec.asInstanceOf[BigIntVector].setSafe(i, row.getLong(c))
      case IntegerType => vec.asInstanceOf[IntVector].setSafe(i, row.getInt(c))
      case DoubleType =>
        vec.asInstanceOf[Float8Vector].setSafe(i, row.getDouble(c))
      case FloatType =>
        vec.asInstanceOf[Float4Vector].setSafe(i, row.getFloat(c))
      case StringType => vec.asInstanceOf[VarCharVector]
        .setSafe(i, row.getString(c).getBytes("UTF-8"))
      case BooleanType => vec.asInstanceOf[BitVector]
        .setSafe(i, if (row.getBoolean(c)) 1 else 0)
      case BinaryType => vec.asInstanceOf[VarBinaryVector]
        .setSafe(i, row.getAs[Array[Byte]](c))
      case TimestampType => vec.asInstanceOf[TimeStampMicroTZVector]
        .setSafe(i, microsOf(row.getTimestamp(c)))
      case ArrayType(et, _) =>
        val lv = vec.asInstanceOf[ListVector]
        val xs = row.getSeq[Any](c)
        val start = lv.startNewValue(i)
        val dv = lv.getDataVector
        var k = 0
        xs.foreach { x =>
          if (x == null) dv.setNull(start + k)
          else et match {
            case DoubleType => dv.asInstanceOf[Float8Vector]
              .setSafe(start + k, x.asInstanceOf[Double])
            case FloatType => dv.asInstanceOf[Float4Vector]
              .setSafe(start + k, x.asInstanceOf[Float])
            case other => throw new IllegalArgumentException(
              s"arrow interchange: unsupported list element $other")
          }
          k += 1
        }
        lv.endValue(i, k)
      case other => throw new IllegalArgumentException(
        s"arrow interchange: unsupported type $other")
    }

  /** Read a directory of `.arrow` IPC shards back as a DataFrame — the
    * schema comes from the first shard's footer (driver-side, O(footer)),
    * the data decodes one task per shard, batch by batch. */
  def readArrow(spark: SparkSession, dir: String): DataFrame = {
    val paths = {
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".arrow")).map(_.getAbsolutePath)
        .sorted.toSeq
    }
    require(paths.nonEmpty, s"no .arrow files under $dir")
    val schema = {
      val alloc = new RootAllocator()
      val in = new java.io.FileInputStream(paths.head)
      val reader = new ArrowFileReader(in.getChannel, alloc)
      try StructType(reader.getVectorSchemaRoot.getSchema.getFields
        .asScala.map(sparkField).toArray)
      finally { reader.close(); in.close(); alloc.close() }
    }
    val rows = spark.sparkContext.parallelize(paths, paths.size).flatMap { p =>
      // STREAM batch-by-batch: task memory holds one record batch, never
      // a whole shard (a shard is partition-sized — at 100 TB that is
      // gigabytes). The reader closes on exhaustion AND on task
      // completion (early termination from a LIMIT must not leak the
      // allocator).
      val alloc = new RootAllocator()
      val in = new java.io.FileInputStream(p)
      val reader = new ArrowFileReader(in.getChannel, alloc)
      var closed = false
      def closeAll(): Unit = if (!closed) {
        closed = true
        try reader.close() finally {
          try in.close() finally alloc.close()
        }
      }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields.asScala.map(sparkField).toArray
      new Iterator[Row] {
        private var i = 0
        private var n = 0
        private def advance(): Unit =
          while (i >= n && !closed) {
            if (reader.loadNextBatch()) { i = 0; n = root.getRowCount }
            else closeAll()
          }
        override def hasNext: Boolean = { advance(); !closed }
        override def next(): Row = {
          advance()
          if (closed) throw new NoSuchElementException("exhausted")
          val r = Row.fromSeq(fields.indices.map(c =>
            getValue(root.getVector(c), fields(c).dataType, i)))
          i += 1
          r
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  private def getValue(vec: FieldVector, dt: DataType, i: Int): Any =
    if (vec.isNull(i)) null
    else dt match {
      case LongType => vec.asInstanceOf[BigIntVector].get(i)
      case IntegerType => vec.asInstanceOf[IntVector].get(i)
      case DoubleType => vec.asInstanceOf[Float8Vector].get(i)
      case FloatType => vec.asInstanceOf[Float4Vector].get(i)
      case StringType =>
        new String(vec.asInstanceOf[VarCharVector].get(i), "UTF-8")
      case BooleanType => vec.asInstanceOf[BitVector].get(i) == 1
      case BinaryType => vec.asInstanceOf[VarBinaryVector].get(i)
      case TimestampType =>
        tsFromMicros(vec.asInstanceOf[TimeStampMicroTZVector].get(i))
      case ArrayType(et, _) =>
        val lv = vec.asInstanceOf[ListVector]
        val start = lv.getElementStartIndex(i)
        val end = lv.getElementEndIndex(i)
        val dv = lv.getDataVector
        (start until end).map { k =>
          if (dv.isNull(k)) null
          else et match {
            case DoubleType => dv.asInstanceOf[Float8Vector].get(k)
            case FloatType => dv.asInstanceOf[Float4Vector].get(k)
            case other => throw new IllegalArgumentException(
              s"arrow interchange: unsupported list element $other")
          }
        }
      case other => throw new IllegalArgumentException(
        s"arrow interchange: unsupported type $other")
    }
}
