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

  /** Root path for application `appId`:
    * `<java.io.tmpdir>/graft_stage_<sanitized appId>_<suffix>`. The app
    * id carries the cross-driver uniqueness (the cluster manager hands
    * each application a distinct one), the suffix guards against appId
    * reuse within one shared-FS lifetime; non-path characters in the id
    * are folded to `-`. */
  private[operators] def stageRootPath(appId: String, suffix: String): String = {
    val safe = appId.map(c => if (c.isLetterOrDigit || c == '-' || c == '.'
      || c == '_') c else '-')
    s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_stage_${safe}_$suffix"
  }

  private val stageRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Application-lifetime stage root for operators whose caller
    * configured no `stageDir`: disk-bounded (not executor memory),
    * deleted on shutdown — the lifetime a `persist()` would have had,
    * without the cache pin. One root per Spark application id, CREATED
    * THROUGH the session's Hadoop filesystem (so on a real cluster it
    * exists on `fs.defaultFS` — the shared filesystem the stages are
    * written to — not merely on the driver's local disk): a
    * driver-local temp name alone is unique only on its own host, and
    * two drivers on different hosts re-resolving their local names
    * against a shared defaultFS could collide; the app id in the name
    * removes that. Cleanup registers with Hadoop's ShutdownHookManager
    * ABOVE the FileSystem-close priority — a plain JVM hook raced
    * Hadoop's own FileSystem shutdown and could find every FS already
    * closed, silently leaking corpus-sized staging under the shared
    * /tmp — and a cleanup failure now logs instead of vanishing. Long
    * pipelines at scale should still set `stageDir` explicitly (lake
    * paths, owned lifecycle); this root is the safe default, not the
    * recommendation. */
  def defaultStageRoot(spark: org.apache.spark.sql.SparkSession): String =
    stageRoots.computeIfAbsent(spark.sparkContext.applicationId, appId => {
      val conf = spark.sparkContext.hadoopConfiguration
      val suffix = java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong())
      val p = new org.apache.hadoop.fs.Path(stageRootPath(appId, suffix))
      val fs = p.getFileSystem(conf)
      fs.mkdirs(p)
      val qualified = fs.makeQualified(p)
      org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
        new Runnable {
          def run(): Unit =
            try {
              val fs2 = qualified.getFileSystem(conf)
              if (fs2.exists(qualified)) { fs2.delete(qualified, true); () }
            } catch { case e: Throwable =>
              System.err.println(
                s"[graft] stage-root cleanup failed for $qualified: $e")
            }
        },
        org.apache.hadoop.fs.FileSystem.SHUTDOWN_HOOK_PRIORITY + 20)
      qualified.toString
    })
}
