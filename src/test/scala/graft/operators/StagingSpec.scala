package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The default stage root's multi-driver contract: the root's name must
  * carry the Spark APPLICATION ID (cross-driver uniqueness on a shared
  * fs.defaultFS — a driver-local temp name is unique only on its own
  * host), be created through the Hadoop FS, and be handed out once per
  * application. */
class StagingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stageRootPath: distinct per application id, path-safe names") {
    val a = Staging.stageRootPath("app-20260815-0001", "abcd")
    val b = Staging.stageRootPath("app-20260815-0002", "abcd")
    assert(a != b, "two drivers' roots must differ by app id alone")
    // ids with path-hostile characters fold to '-' instead of nesting
    val ugly = Staging.stageRootPath("spark://host:7077/app 1", "x")
    val name = ugly.substring(ugly.lastIndexOf('/') + 1)
    assert(name.startsWith("graft_stage_") && !name.contains(":")
      && !name.contains(" "), name)
  }

  test("defaultStageRoot: app id in the name, memoized, created via Hadoop FS") {
    val root = Staging.defaultStageRoot(spark)
    assert(root.contains(spark.sparkContext.applicationId.replaceAll(
      "[^A-Za-z0-9-._]", "-")), s"root must embed the app id: $root")
    // one root per application — repeated calls must not mint new dirs
    assert(Staging.defaultStageRoot(spark) == root)
    // created through (and qualified against) the session's Hadoop FS:
    // the returned path carries a scheme and exists on that FS
    val p = new org.apache.hadoop.fs.Path(root)
    assert(Option(p.toUri.getScheme).nonEmpty,
      s"root must be FS-qualified: $root")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(p), s"root must exist on the session FS: $root")
  }

  test("stage/stageOrPersist round-trips through the default root") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val root = Staging.defaultStageRoot(spark)
    val staged = Staging.stage(df, root,
      s"spec_${Staging.stageCounter.incrementAndGet()}")
    assert(staged.orderBy($"id").collect().map(_.getString(1)).toSeq
      == Seq("a", "b"))
  }
}
