package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout maintenance: z-order clustering must make EVERY participating
  * column's per-file range narrow (the pruning property), compaction must
  * shrink the file count without touching content. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, TestSpark.sf)
    .select($"doc_id", $"n_chars", $"lang")

  /** #files holding rows that match `cond` — the lower bound on files a
    * stats-pruned scan must open; tight layouts make it small. */
  private def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
    spark.read.parquet(path).filter(cond)
      .select(input_file_name()).distinct().count()

  test("z-order clusters BOTH dimensions; a single-column sort only one") {
    val n = docs.count()
    val zPath = java.nio.file.Files.createTempDirectory("zord").toString + "/t"
    val sPath = java.nio.file.Files.createTempDirectory("sort").toString + "/t"
    val files = 16
    Layout.zorderParquet(docs, zPath, Seq("doc_id", "n_chars"), files)
    // the comparison layout: same file count, sorted by doc_id only
    docs.repartitionByRange(files, $"doc_id").write.parquet(sPath)
    // ~5%-selectivity predicates on each dimension
    val idPred = $"doc_id".between(n / 2, n / 2 + n / 20)
    val lens = docs.stat.approxQuantile("n_chars", Array(0.5, 0.55), 0.001)
    val lenPred = $"n_chars".between(lens(0), lens(1))
    val (zId, zLen) = (filesTouched(zPath, idPred), filesTouched(zPath, lenPred))
    val (sId, sLen) = (filesTouched(sPath, idPred), filesTouched(sPath, lenPred))
    // sorted layout: great on its sort key, hopeless on the other
    assert(sId <= 3, s"doc_id-sorted layout should bound doc_id probes: $sId")
    assert(sLen >= files - 2,
      s"n_chars rows should spread across a doc_id-sorted layout: $sLen")
    // z-order: BOTH dimensions bounded well below the file count
    assert(zId <= files / 2, s"z-order doc_id probe touched $zId of $files")
    assert(zLen <= files / 2, s"z-order n_chars probe touched $zLen of $files")
    // and the layout preserved content exactly
    assert(spark.read.parquet(zPath).count() == n)
    assert(spark.read.parquet(zPath).agg(sum($"doc_id"), sum($"n_chars"))
      .head() == docs.agg(sum($"doc_id"), sum($"n_chars")).head())
  }

  test("z-order argument validation") {
    intercept[IllegalArgumentException] {
      Layout.zorderParquet(docs, "/tmp/nope", Seq("doc_id"), 4)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderParquet(docs, "/tmp/nope", Seq("a", "b", "c"), 4, bits = 32)
    }
  }

  test("bloom-filter write lands filters in the parquet footers, content intact") {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Files.createTempDirectory("blm").toString + "/t"
    Layout.parquetWithBloom(docs, path, Seq("doc_id"), ndv = 100000L)
    val file = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        new org.apache.hadoop.conf.Configuration()))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns.asScala
      val byName = cols.map(c => c.getPath.toDotString -> c).toMap
      // the bloom'd column carries a filter offset; the others must not
      // (footer bytes are per-row-group — filters on every column would
      // bloat footers for columns nothing point-looks-up)
      assert(byName("doc_id").getBloomFilterOffset > 0,
        "doc_id bloom filter missing from the footer")
      assert(byName("n_chars").getBloomFilterOffset <= 0,
        "n_chars must not carry a bloom filter")
      // and the filter actually answers: a member id might be present,
      // a definitely-absent id is rejected
      val bloom = reader.readBloomFilter(byName("doc_id"))
      assert(bloom != null)
      val present = docs.select("doc_id").head().getLong(0)
      assert(bloom.findHash(bloom.hash(present)))
    } finally reader.close()
    assert(spark.read.parquet(path).count() == docs.count())
  }

  test("compaction shrinks the file count, preserves content, cleans up") {
    val path = java.nio.file.Files.createTempDirectory("cmp").toString + "/t"
    docs.repartition(50).write.parquet(path)
    val before = docs.agg(sum($"doc_id"), sum($"n_chars"), count(lit(1))).head()
    val (nb, na, rows) = Layout.compactParquet(spark, path, targetMB = 512)
    assert(nb == 50L && na < nb, s"$nb -> $na")
    assert(rows == docs.count())
    val after = spark.read.parquet(path)
      .agg(sum($"doc_id"), sum($"n_chars"), count(lit(1))).head()
    assert(after == before)
    // no tmp/old residue
    val parent = new java.io.File(path).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("compact_")), parent.mkString(","))
  }
}
