package graft.operators

import org.apache.spark.sql.DataFrame

/** Lake-staged intermediates for multi-stage corpus pipelines.
  *
  * `.persist()` is the right lifecycle for HASH-SIZED frames (NearDup's
  * shingle/band caches, ~1% of corpus bytes), but a corpus-sized TEXT
  * frame cached for several consumers is executor-storage pressure that
  * belongs in the lake: at 100 TB the cleaned-text intermediate of an
  * assembly pipeline does not fit a cluster's storage memory, and
  * MEMORY_AND_DISK spill just rewrites it to local disks that the next
  * stage re-reads without data locality guarantees. Staging writes the
  * intermediate ONCE to the lake (parquet — columnar, compressed,
  * partition-prunable by every consumer) and re-reads it per consumer:
  * the same read-amplification as a spilled cache, none of the storage
  * pressure, plus a durable, inspectable artifact between stages.
  */
object Staging {

  /** Materialize `df` to `stageDir/name` and return the re-read frame.
    * Every consumer of the result scans the staged parquet instead of
    * re-deriving (or caching) the upstream plan. Overwrites any previous
    * stage of the same name — stages are derived data, safe to replace. */
  def stage(df: DataFrame, stageDir: String, name: String): DataFrame = {
    val path = s"$stageDir/$name"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Stage when a dir is configured, persist otherwise — the opt-in knob
    * operators expose as `stageDir`. */
  def stageOrPersist(df: DataFrame, stageDir: Option[String],
                     name: String): DataFrame = stageDir match {
    case Some(d) => stage(df, d, name)
    case None => df.persist()
  }

  /** Unique per-call stage names under [[defaultStageRoot]]. */
  val stageCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** JVM-lifetime stage root for operators whose caller configured no
    * `stageDir`: disk-bounded (not executor memory), deleted on
    * shutdown — the lifetime a `persist()` would have had, without the
    * cache pin. The schemeless path resolves against `fs.defaultFS`
    * when the stage is written, so on a real cluster the data lands on
    * the shared filesystem (HDFS `/tmp/...`), not the driver's local
    * disk — which is why the shutdown sweep deletes through the Hadoop
    * FS abstraction too, not just local NIO. Long pipelines at scale
    * should still set `stageDir` explicitly (lake paths, owned
    * lifecycle); this root is the safe default, not the recommendation. */
  lazy val defaultStageRoot: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stage")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(d).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
      try {
        // cluster case: the staged parquet lives under defaultFS, which
        // local NIO cannot see (no-op when defaultFS IS the local fs —
        // the walk above already removed it)
        val p = new org.apache.hadoop.fs.Path(d.toString)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        if (fs.exists(p)) { fs.delete(p, true); () }
      } catch { case _: Throwable => () }
    }))
    d.toString
  }
}
