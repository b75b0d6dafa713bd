package graft.operators

/** Driver-side concurrency for INDEPENDENT Spark actions (guide §2.6:
  * the scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially). Used where an operator's epilogue writes several
  * unrelated tables (index stores, signature tables): overlapping the
  * jobs lets one write's task tail back-fill the executors another's
  * stragglers leave idle, and folds the per-job scheduling latency of
  * N small writes into max instead of sum. */
private[graft] object Jobs {

  /** Run the thunks concurrently on a dedicated pool sized to the job
    * count; propagates the first failure; always tears the pool down.
    * Single-element and empty inputs run inline. */
  def parallel(jobs: (() => Unit)*): Unit = {
    if (jobs.size <= 1) { jobs.foreach(_.apply()); () }
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(jobs.size)
      try {
        import scala.jdk.CollectionConverters._
        val futures = pool.invokeAll(
          jobs.map(j => new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = j()
          }).asJava)
        futures.asScala.foreach(_.get()) // surface the first failure
      } catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      } finally { pool.shutdown(); () }
    }
  }
}
