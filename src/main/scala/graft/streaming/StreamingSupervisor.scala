package graft.streaming

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Restart-with-backoff supervision for long-running streaming queries —
  * the Structured-Streaming counterpart of the reference scheduler's failed-
  * task restart loop (mycelial `myceliald/src/scheduler.rs:79-187,230-260`),
  * which batch pipelines already get from [[graft.plans.Orchestrator]].
  *
  * Driven by a [[StreamingQueryListener]]: a termination WITH exception
  * triggers a restart (exponential backoff, bounded attempts) through the
  * caller-supplied start thunk; because the thunk reuses the query's
  * checkpoint location, the restart resumes from committed offsets — epochs
  * acked before the failure are never reprocessed (the reference's
  * state-after-ack contract). A clean termination ends supervision.
  *
  * Restarts run on a dedicated thread: the listener-bus thread must never
  * block on backoff sleeps or query startup.
  */
final class StreamingSupervisor(spark: SparkSession,
                                restartBackoffMs: Long = 3000,
                                maxRestarts: Int = 3) {

  final class Handle private[StreamingSupervisor] (
      private[StreamingSupervisor] val start: () => StreamingQuery) {
    private[StreamingSupervisor] val restarts = new AtomicInteger(0)
    private[StreamingSupervisor] val done = new CountDownLatch(1)
    private[StreamingSupervisor] val error = new AtomicReference[Throwable](null)

    def restartCount: Int = restarts.get

    /** Block until the supervised query terminates cleanly (restarts
      * exhausted → the terminal failure is rethrown). */
    def await(timeoutMs: Long = Long.MaxValue): Unit = {
      if (!done.await(timeoutMs, TimeUnit.MILLISECONDS))
        throw new RuntimeException("supervised query did not finish in time")
      val e = error.get
      if (e != null) throw e
    }
  }

  private val byRunId = new ConcurrentHashMap[UUID, Handle]()
  // termination events that raced ahead of register()'s put: the listener
  // stashes them by runId and register() replays the decision after the put.
  // Stashing only happens while a register() is in flight; foreign entries
  // (other queries terminating in that window) age out via the FIFO cap so
  // the map never grows with session lifetime.
  private val earlyTerm = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[UUID, Option[String]]() {
      override def removeEldestEntry(
          e: java.util.Map.Entry[UUID, Option[String]]): Boolean = size > 64
    })
  private val registering = new AtomicInteger(0)

  private def onTerminated(h: Handle, exception: Option[String]): Unit =
    exception match {
      case None => h.done.countDown() // clean stop: supervision complete
      case Some(msg) =>
        val attempt = h.restarts.incrementAndGet()
        if (attempt > maxRestarts) {
          h.error.set(new RuntimeException(
            s"streaming query failed after $maxRestarts restarts: $msg"))
          h.done.countDown()
        } else {
          val t = new Thread(() => {
            try {
              Thread.sleep(restartBackoffMs * (1L << (attempt - 1)))
              register(h)
            } catch {
              case e: Throwable => h.error.set(e); h.done.countDown()
            }
          }, s"graft-stream-restart-$attempt")
          t.setDaemon(true)
          t.start()
        }
    }

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(ev: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      val h = byRunId.remove(ev.runId)
      if (h != null) onTerminated(h, ev.exception)
      else if (registering.get > 0) earlyTerm.put(ev.runId, ev.exception)
    }
  }
  spark.streams.addListener(listener)

  private def register(h: Handle): Unit = {
    registering.incrementAndGet()
    try {
      val q = h.start()
      byRunId.put(q.runId, h)
      // a query that failed between start() and the put above left its
      // event in earlyTerm — replay it now (exactly one side wins the remove)
      val early = earlyTerm.remove(q.runId)
      if (early != null && byRunId.remove(q.runId, h)) onTerminated(h, early)
    } finally registering.decrementAndGet()
  }

  /** Start `start` under supervision. The thunk MUST create a fresh query
    * each call and reuse the same checkpoint location. */
  def supervise(start: () => StreamingQuery): Handle = {
    val h = new Handle(start)
    register(h)
    h
  }

  /** Detach the listener (tests / shutdown). */
  def close(): Unit = spark.streams.removeListener(listener)
}
