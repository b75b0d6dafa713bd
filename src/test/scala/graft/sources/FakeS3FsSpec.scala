package graft.sources

import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.hadoop.fs.RawLocalFileSystem
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** A Hadoop FileSystem registered under a NON-local scheme. The s3 source
  * claim (SURVEY §2.1 S8) is that `Sources.dir`'s pattern + `startAfter`
  * cursor semantics are code-shared with the object-store path because
  * both go through the Hadoop FileSystem API — this class makes that
  * claim testable without an object store: `fakes3://` resolves through
  * the same `fs.<scheme>.impl` reflection, URI handling, and listing
  * calls an `s3a://` path does, while backing onto a local directory.
  * (RawLocalFileSystem, not LocalFileSystem: no `.crc` shadow files to
  * pollute the listing.) Hadoop instantiates it reflectively, so it must
  * be a top-level class with a no-arg constructor. */
class FakeS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "fakes3"
  override def getUri: URI = URI.create("fakes3:///")
}

class FakeS3FsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withBucket(test: String => Unit): Unit = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.fakes3.impl", classOf[FakeS3FileSystem].getName)
    val tmp = Files.createTempDirectory("fakes3").toFile
    Seq("obj-a.csv" -> "a1", "obj-b.csv" -> "b2", "obj-c.txt" -> "c3")
      .foreach { case (name, content) =>
        Files.write(new java.io.File(tmp, name).toPath,
          content.getBytes(StandardCharsets.UTF_8))
      }
    // absolute paths start with '/', so "fakes3://" + path has an empty
    // authority and the path intact — the same URI shape as s3a://bucket/…
    test(s"fakes3://$tmp")
  }

  test("dir source pattern + startAfter cursor over a non-local FileSystem") {
    withBucket { bucket =>
      import spark.implicits._
      val all = Sources.dir(spark, bucket, pattern = ".*\\.csv$")
        .select("path").as[String].collect().sorted
      assert(all.length == 2, s"pattern must filter the txt object: ${all.toSeq}")
      assert(all.forall(_.startsWith("fakes3:")),
        "listing must resolve through the fake scheme, not file:")
      // lexicographic cursor: everything <= startAfter is skipped — the
      // reference's ListObjectsV2 start_after contract
      // (`sections/s3/src/source.rs:174-300`)
      val after = Sources.dir(spark, bucket, pattern = ".*\\.csv$",
        startAfter = all.head).select("path").as[String].collect()
      assert(after.toSeq == Seq(all(1)))
      // cursor past the end → empty listing, not an error
      assert(Sources.dir(spark, bucket, startAfter = "fakes3:~").count() == 0)
    }
  }

  test("dir source binary mode reads object bytes through the fake scheme") {
    withBucket { bucket =>
      import spark.implicits._
      val rows = Sources.dir(spark, bucket, pattern = ".*obj-b.*",
          streamBinary = true)
        .select($"path", $"value").as[(String, Array[Byte])].collect()
      assert(rows.length == 1)
      assert(new String(rows.head._2, StandardCharsets.UTF_8) == "b2")
    }
  }
}
