package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Cross-daemon pipeline split — the reference's one runtime behavior with
  * no prior analog here: its control plane places a pipeline's sections on
  * DIFFERENT daemons, each daemon holds only a partial graph, and an edge
  * whose other endpoint is remote classifies the local section Inbound /
  * Outbound (`graph/src/lib.rs:119-132` `add_edge_partial` keeps the
  * half-resolved edge; `myceliald/src/scheduler.rs:263-268` the
  * SectionType enum and classification at plan time).
  *
  * Spark-first translation: a cluster already IS the fleet for data-plane
  * parallelism, so daemon splits here serve the reference's OTHER use case
  * — a pipeline whose halves must run in different processes/sites (an
  * edge collector publishing into a lake a central engine consumes).
  * [[split]] cuts a validated spec along a daemon assignment, replacing
  * each cross-daemon edge with an `outbound_bridge` destination on the
  * producing daemon and an `inbound_bridge` source on the consuming one,
  * joined by a DURABLE directory (local fs here; the same code targets a
  * shared/object store path on a cluster).
  *
  * Delivery contract (the reference's ack model, end to end):
  *  - outbound publishes each tick as an immutable SLICE
  *    (`dir/slices/<id>/` parquet) made visible only by an atomic commit
  *    marker rename (`dir/commits/<id>`) — a consumer can never observe a
  *    half-written slice;
  *  - inbound serves every committed slice past its cursor, and the cursor
  *    advances (StateStore, tmp+ATOMIC_MOVE) strictly AFTER the consuming
  *    component's sinks have run — a sink failure replays the slice on the
  *    next round (at-least-once, `section/src/command_channel.rs:68-80`);
  *  - a crash between slice write and commit leaves an orphan slice dir;
  *    the next publish reuses its id with mode=overwrite, so orphans can
  *    neither be served nor accumulate.
  *
  * Scale shape: the bridge moves data as parquet slices (columnar,
  * partitioned, predicate-pushdown-able on the consuming side); the only
  * driver-side state is the cursor long and the commit-marker listing,
  * O(#slices) names — never row data.
  */
object DaemonBridge {

  // ---------------------------------------------------------------- split

  /** Cut `spec` along `daemonOf` (section id → daemon id). Returns one
    * PARTIAL spec per daemon; every cross-daemon edge (f → t) becomes
    *   daemon(f):  f → `<f>__to__<t>__outbound`
    *   daemon(t):  `<f>__to__<t>__inbound` → t
    * bridged at `<bridgeRoot>/<f>__to__<t>`. Cursor state lives under
    * `stateRoot` keyed by (bridge name, "inbound") so a re-split of the
    * same logical pipeline resumes where it acked. */
  def split(spec: PipelineSpec, daemonOf: Map[String, String],
            bridgeRoot: String, stateRoot: String): Map[String, PipelineSpec] = {
    spec.validate()
    spec.sections.foreach { s =>
      require(daemonOf.contains(s.id), s"section ${s.id} has no daemon assignment")
    }
    val daemons = daemonOf.values.toSeq.distinct.sorted
    daemons.map { d =>
      val owned = spec.sections.filter(s => daemonOf(s.id) == d)
      val ownedIds = owned.map(_.id).toSet
      val local = spec.edges.filter { case (f, t) =>
        ownedIds.contains(f) && ownedIds.contains(t)
      }
      // outbound halves: edges leaving this daemon
      val outs = spec.edges.collect {
        case (f, t) if ownedIds.contains(f) && !ownedIds.contains(t) =>
          val name = s"${f}__to__$t"
          (SectionSpec(s"${name}__outbound", "outbound_bridge",
            Map("dir" -> s"$bridgeRoot/$name")), (f, s"${name}__outbound"))
      }
      // inbound halves: edges arriving at this daemon
      val ins = spec.edges.collect {
        case (f, t) if !ownedIds.contains(f) && ownedIds.contains(t) =>
          val name = s"${f}__to__$t"
          (SectionSpec(s"${name}__inbound", "inbound_bridge",
            Map("dir" -> s"$bridgeRoot/$name", "state_dir" -> stateRoot,
              "pipeline" -> name, "section" -> "inbound")),
            (s"${name}__inbound", t))
      }
      d -> PipelineSpec(
        owned ++ outs.map(_._1) ++ ins.map(_._1),
        local ++ outs.map(_._2) ++ ins.map(_._2))
    }.toMap
  }

  // ------------------------------------------------------------- runtime

  /** Publish one slice; returns its id. Id allocation is max committed + 1,
    * so an orphaned uncommitted slice dir from a crash is overwritten by
    * the next publish rather than leaking. */
  def publish(df: DataFrame, dir: String): Long = {
    require(!df.isStreaming,
      "outbound_bridge is a batch/tick bridge; route streaming frames " +
        "through stream_parquet_destination and a stream source instead")
    val base = Paths.get(dir)
    Files.createDirectories(base.resolve("slices"))
    Files.createDirectories(base.resolve("commits"))
    val id = committedIds(dir).lastOption.getOrElse(-1L) + 1L
    df.write.mode("overwrite").parquet(s"$dir/slices/$id")
    val tmp = base.resolve(s"commits/.$id.tmp")
    Files.write(tmp, id.toString.getBytes("UTF-8"))
    Files.move(tmp, base.resolve(s"commits/$id"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    id
  }

  /** Committed slice ids in order. O(#slices) directory listing; the data
    * itself is never touched here. */
  def committedIds(dir: String): Seq[Long] = {
    val commits = Paths.get(dir, "commits")
    if (!Files.exists(commits)) Nil
    else {
      val listing = Files.list(commits)
      try listing.iterator().asScala.map(_.getFileName.toString)
        .filter(_.forall(_.isDigit)).map(_.toLong).toSeq.sorted
      finally listing.close()
    }
  }

  /** The inbound compile: committed slices past the cursor as one frame,
    * with the cursor advance REGISTERED (not applied) — it fires only when
    * [[commitAcks]] runs after the consuming component's sinks succeed.
    * Caught-up → an empty frame with the latest slice's schema (a no-op
    * tick for downstream sinks). Nothing published yet → throw; the
    * orchestrator's restart/backoff loop retries, which is exactly the
    * reference daemon's behavior when a remote peer hasn't produced. */
  def pendingFrame(spark: SparkSession, c: Map[String, String]): DataFrame = {
    val dir = c("dir")
    val store = new StateStore(c("state_dir"))
    val pipe = c("pipeline"); val sect = c.getOrElse("section", "inbound")
    val cursor = store.getLong(pipe, sect, "slice").getOrElse(-1L)
    val all = committedIds(dir)
    val pending = all.filter(_ > cursor)
    if (pending.isEmpty) {
      require(all.nonEmpty,
        s"inbound_bridge: nothing published yet at $dir — is the " +
          "producing daemon's half running?")
      spark.read.parquet(s"$dir/slices/${all.last}").limit(0)
    } else {
      val df = spark.read.parquet(pending.map(i => s"$dir/slices/$i"): _*)
      registerAck(() => store.set(pipe, sect, "slice" -> pending.max.toString))
      df
    }
  }

  // Deferred cursor advances for the component currently compiling on this
  // thread. PipelineCompiler.run drains them strictly after the
  // component's sinks have executed — the ack-after-commit ordering.
  private val acks = ThreadLocal.withInitial[
    scala.collection.mutable.Buffer[() => Unit]](
    () => scala.collection.mutable.Buffer.empty)

  def registerAck(f: () => Unit): Unit = acks.get() += f

  def commitAcks(): Unit = { val a = acks.get(); a.foreach(_.apply()); a.clear() }

  def clearAcks(): Unit = acks.get().clear()
}
