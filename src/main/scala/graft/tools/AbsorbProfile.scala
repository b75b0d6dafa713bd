package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (r21): phase timings for the dd_dedup_index_absorb /
  * _compact bench bodies — where do the 6.3s / 10.5s actually go?
  * Usage: runMain graft.tools.AbsorbProfile <sfDir>
  */
object AbsorbProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("prof_sigidx").toString
    t("build (ref %3=0)") {
      graft.operators.NearDup.writeSignatureIndex(
        docs.filter($"doc_id" % 3 === 0), base)
    }
    // copy per iteration like the bench body
    (1 to 2).foreach { it =>
      println(s"--- iteration $it")
      val idx = java.nio.file.Files.createTempDirectory("prof_sigabs")
      t("copyTree") {
        val src = java.nio.file.Paths.get(base)
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(src)
        try walk.iterator().asScala.foreach { p =>
          val dst = idx.resolve(src.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(dst)
          else java.nio.file.Files.copy(p, dst)
        } finally walk.close()
      }
      t("absorb (%3=1)") {
        graft.operators.NearDup.absorbIntoIndex(
          docs.filter($"doc_id" % 3 === 1), idx.toString)
      }
      t("compact (max 1)") {
        graft.operators.NearDup.compactSignatureIndex(spark, idx.toString,
          maxFilesPerBucket = 1)
      }
      t("probe (%3=2)") {
        graft.operators.NearDup.dedupAgainstIndex(
          docs.filter($"doc_id" % 3 === 2), idx.toString)
          .orderBy($"doc_id").count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
