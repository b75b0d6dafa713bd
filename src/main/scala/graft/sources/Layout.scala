package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-LAYOUT maintenance for the parquet lake — the two operations a
  * 100 TB table needs periodically that no query expresses:
  *
  *  - [[zorderParquet]]: multi-dimensional clustering. Sorting a table by
  *    one column makes that column's min/max file stats tight (scans
  *    pruning on it open few files) but leaves every OTHER column's
  *    ranges spanning the whole table. Interleaving the bits of
  *    quantile-bucket ranks (a Z-order / Morton curve) makes EVERY
  *    participating column's per-file range narrow, so predicates on any
  *    of them skip most files — the standard lakehouse answer (Delta
  *    OPTIMIZE ZORDER BY, Iceberg sort orders) built from plain Spark:
  *    one narrow bucketing pass + one range repartition, no new format.
  *  - [[compactParquet]]: small-file compaction. Incremental sinks
  *    accumulate files far below the row-group sweet spot; scans then pay
  *    per-file open/footer costs and lose row-group parallelism. Rewrite
  *    into ~`targetMB` files atomically (tmp dir + two renames), with a
  *    row-count guard before the swap — a failed rewrite can never
  *    replace the table with less than all of it.
  *
  * Both preserve CONTENT exactly (layout is physical, not logical) —
  * `op_layout` pins that end to end against the SQL oracle, and
  * `LayoutSpec` pins the pruning/compaction effects themselves. */
object Layout {

  /** Morton interleave of `bs` bucket-rank columns, `bits` bits each:
    * bit b of rank i lands at position b·n+i. Pure long shifts/ors —
    * codegen-friendly, no UDF. */
  private def interleave(bs: Seq[Column], bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, bit) =>
      bs.zipWithIndex.foldLeft(acc) { case (a, (b, i)) =>
        a.bitwiseOR(shiftleft(
          shiftright(b, bit).bitwiseAND(lit(1L)), bit * bs.size + i))
      }
    }

  /** Quantile-bucket rank of `c` against driver-computed boundaries:
    * rank = #boundaries ≤ x (a 2^bits-way EQUI-DEPTH bucketing, so skew
    * cannot pile the curve into few codes the way equi-width would).
    * The comparison runs over a literal array — O(2^bits) per row, which
    * is why `bits` defaults to 8 (256 comparisons) not 16. Nulls rank 0:
    * they cluster together at the curve's origin. */
  private def bucketRank(c: String, boundaries: Array[Double]): Column =
    size(filter(typedLit(boundaries.toSeq),
      e => e <= col(c).cast("double"))).cast("long")

  /** Z-ORDER rewrite: cluster `df` on the Morton curve over `zCols` and
    * write `targetFiles` parquet files, each covering a narrow range of
    * EVERY zCol. Boundaries come from `approxQuantile` (driver-side,
    * O(2^bits·#cols) doubles — model-sized at any scale); the one wide
    * operation is the range repartition on the z-value, exactly the
    * shuffle a plain global sort would also pay. */
  def zorderParquet(df: DataFrame, path: String, zCols: Seq[String],
                    targetFiles: Int, bits: Int = 8): Unit = {
    require(zCols.size >= 2, "z-ordering needs at least two columns " +
      "(for one, a plain sort is strictly better)")
    require(zCols.size * bits <= 62, s"${zCols.size} cols × $bits bits " +
      "overflow the long z-value")
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val bnds = zCols.map(c => c ->
      df.stat.approxQuantile(c, probs, 0.001).distinct).toMap
    val z = interleave(zCols.map(c => bucketRank(c, bnds(c))), bits)
    df.withColumn("_z", z)
      .repartitionByRange(targetFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z") // projection preserves the in-partition order
      .write.mode("overwrite").parquet(path)
  }

  /** Parquet write with column BLOOM FILTERS — the point-lookup
    * complement of [[zorderParquet]]'s range pruning: `WHERE id = x` on
    * a 100 TB table can skip every row group whose bloom filter rejects
    * `x`, even where min/max stats are useless (high-cardinality ids
    * spread across the whole range in every file). Pure writer options
    * on Spark's parquet sink (`parquet.bloom.filter.enabled#col`) — the
    * filters land in the file footers and every parquet reader
    * (Spark's included) prunes with them; `ndv` sizes the filter
    * (expected distinct values per row group — overshooting costs
    * footer bytes, undershooting costs false-positive reads, never
    * correctness). */
  def parquetWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                       ndv: Long = 1000000L): Unit = {
    require(bloomCols.nonEmpty, "need at least one bloom column")
    bloomCols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }.parquet(path)
  }

  /** Compact a parquet directory into ~`targetMB` files. Reads the
    * listing for the current total size (driver metadata, O(#files)),
    * rewrites into `ceil(total/target)` files in a sibling tmp dir,
    * VERIFIES the row count, then swaps via two renames. The table is
    * briefly absent between the renames — callers needing reader-level
    * snapshot isolation should layer the upsert manifest instead; this
    * is the maintenance pass for append-only lakes where a moment of
    * ENOENT beats a format dependency. Returns (filesBefore, filesAfter,
    * rows). */
  def compactParquet(spark: SparkSession, path: String,
                     targetMB: Int = 128): (Long, Long, Long) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(hPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1L, math.ceil(
      totalBytes.toDouble / (targetMB.toLong << 20)).toLong).toInt
    val before = spark.read.parquet(path)
    val expected = before.count()
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact_tmp")
    fs.delete(tmp, true)
    before.repartition(n).write.mode("overwrite").parquet(tmp.toString)
    val got = spark.read.parquet(tmp.toString).count()
    require(got == expected,
      s"compaction row-count mismatch at $path: $expected -> $got — " +
      "rewrite aborted, original left in place")
    val old = new org.apache.hadoop.fs.Path(path + ".compact_old")
    fs.delete(old, true)
    require(fs.rename(hPath, old), s"could not retire $path")
    require(fs.rename(tmp, hPath), s"could not promote compacted $path")
    fs.delete(old, true)
    val after = fs.listStatus(hPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (files.length.toLong, after.toLong, expected)
  }
}
