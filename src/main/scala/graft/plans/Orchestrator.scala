package graft.plans

import org.apache.spark.sql.SparkSession

/** Declarative reconciliation of running pipelines — the counterpart of the
  * daemon scheduler (mycelial `myceliald/src/scheduler.rs:403-485`):
  * desired state = a set of specs; each connected component is hashed
  * (ids + configs + edges, SHA-256); diff against running components stops
  * the stale, keeps the unchanged, and starts the new. Failure → restart
  * with backoff (`scheduler.rs:79-187`, 3 s backoff / bounded retries).
  */
object Orchestrator {
  sealed trait RunState
  case object Succeeded extends RunState
  final case class Failed(error: Throwable) extends RunState

  final case class RunningPipeline(hash: String, spec: PipelineSpec,
                                   state: RunState, restarts: Int)
}

final class Orchestrator(spark: SparkSession,
                         restartBackoffMs: Long = 3000,
                         maxRestarts: Int = 3) {
  import Orchestrator._

  private var running = Map.empty[String, RunningPipeline]

  def runningHashes: Set[String] = running.keySet

  /** Reconcile desired specs against running components. Returns
    * (started, kept, stopped) hashes. Batch pipelines "run" by executing
    * once per reconcile round; an unchanged, already-succeeded component is
    * NOT re-run (declarative idempotency — matches the reference keeping
    * untouched pipelines running across config pushes). */
  def reconcile(desired: Seq[PipelineSpec]): (Set[String], Set[String], Set[String]) = {
    val components = desired.flatMap(_.components)
    val desiredByHash = components.map(c => c.specHash -> c).toMap
    val stopped = running.keySet -- desiredByHash.keySet
    val kept = running.keySet & desiredByHash.keySet
    val started = desiredByHash.keySet -- running.keySet
    running --= stopped
    started.toSeq.sorted.foreach { h => runWithRetry(h, desiredByHash(h)) }
    (started, kept, stopped)
  }

  private def runWithRetry(hash: String, spec: PipelineSpec): Unit = {
    var attempt = 0
    var result: RunState = Succeeded
    var done = false
    while (!done) {
      try { PipelineCompiler.run(spark, spec); result = Succeeded; done = true }
      catch {
        case e: Throwable if attempt < maxRestarts =>
          attempt += 1
          Thread.sleep(restartBackoffMs)
        case e: Throwable => result = Failed(e); done = true
      }
    }
    running += hash -> RunningPipeline(hash, spec, result, attempt)
  }

  def stateOf(hash: String): Option[RunState] = running.get(hash).map(_.state)
}

/** Incremental (watermark) pipeline runner — the reference's stateful-query
  * loop (SURVEY §3.3): each tick binds the persisted watermark into the
  * query, processes the slice through `process`, then — strictly after the
  * sink commit succeeds — advances the watermark to max(watermark column).
  * Crash between commit and state write ⇒ replay of one slice: the same
  * at-least-once contract as the reference's ack protocol; pair with an
  * idempotent sink (dedup key) for effectively-once.
  */
final class IncrementalRunner(spark: SparkSession, store: StateStore) {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.max

  /** Run one tick. Returns the new watermark, or None when the slice was
    * empty (caught-up). `runQuery` receives the bound SQL. */
  def tick(pipeline: String, section: String, query: StatefulQuery,
           runQuery: String => DataFrame,
           sink: DataFrame => Unit): Option[Long] = {
    val varName = query.variable.getOrElse(
      throw new IllegalArgumentException("query has no $var::i64 placeholder"))
    val wm = store.getLong(pipeline, section, varName)
      .getOrElse(StatefulQuery.InitialWatermark)
    val slice = runQuery(query.bind(wm))
    // one pass: cache the slice, write it, then fold the new watermark
    slice.persist()
    try {
      val rows = slice.count()
      if (rows == 0) None
      else {
        sink(slice)
        val newWm = slice.agg(max(varName)).head().getLong(0)
        // state write strictly after sink success — ack-after-commit
        store.set(pipeline, section, varName -> newWm.toString)
        Some(newWm)
      }
    } finally slice.unpersist()
  }

  /** Drive ticks until caught up (reference resets its poll interval to 0
    * while slices are non-empty for catch-up,
    * `sections/postgres_connector/src/source.rs:114-125`). */
  def catchUp(pipeline: String, section: String, query: StatefulQuery,
              runQuery: String => DataFrame, sink: DataFrame => Unit,
              maxTicks: Int = 1000): Long = {
    var last = store.getLong(pipeline, section, query.variable.get)
      .getOrElse(StatefulQuery.InitialWatermark)
    var ticks = 0
    var continue = true
    while (continue && ticks < maxTicks) {
      tick(pipeline, section, query, runQuery, sink) match {
        case Some(wm) => last = wm; ticks += 1
        case None => continue = false
      }
    }
    last
  }
}
