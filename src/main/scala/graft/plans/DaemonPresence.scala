package graft.plans

/** Live-daemon registry — the analog of the reference's `DaemonTracker`
  * (`control_plane/src/app/daemon_tracker.rs:9-60`, wired through
  * `daemon_connected`/`daemon_disconnected`/`daemon_set_last_seen` in
  * `control_plane/src/app/mod.rs:579-597`): the ws listener reports
  * connects and disconnects keyed by daemon identity (the mTLS peer CN,
  * or the `X-Graft-Daemon` header in bearer mode), `GET /daemon` merges
  * an `Online`/`Offline` status from it exactly like the reference's
  * `list_daemons` (`mod.rs:558-572` — stored records default Offline,
  * live ids flip Online; unknown live ids never appear), `last_seen` is
  * stamped when a daemon's last connection drops, and deleting a daemon
  * kicks its live sockets (the reference's `shutdown_daemon`).
  *
  * Connections from ids the control plane has no record of are REJECTED
  * (the reference's `daemon_connected` errors for unknown ids,
  * `mod.rs:588-593`) — possession of a push credential does not make an
  * unjoined process a daemon.
  */
final class DaemonPresence(cp: ControlPlane,
                           now: () => Long = () => System.currentTimeMillis()) {
  private val live = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.Set[java.net.Socket]]()

  /** True when the control plane has a record of `id` — the pre-handshake
    * screen (unknown ids get 403 BEFORE the 101 is written, so rejection
    * never races registration). */
  def known(id: String): Boolean = cp.hasDaemon(id)

  /** Register a connection. False — reject the socket — when the
    * control plane has no record of the daemon. Add-and-create runs
    * inside ONE per-key compute: a concurrent [[disconnected]] of the
    * id's last other socket can never strand this add on a removed set. */
  def connected(id: String, sock: java.net.Socket): Boolean =
    cp.hasDaemon(id) && {
      live.compute(id, (_, cur) => {
        val set = if (cur == null)
          java.util.concurrent.ConcurrentHashMap.newKeySet[java.net.Socket]()
        else cur
        set.add(sock)
        set
      })
      true
    }

  /** Deregister; stamps `last_seen` (every close updates it — the
    * freshest sighting wins, monotone by construction). Remove-and-drop
    * runs inside one per-key compute (returning null drops the entry),
    * atomic against concurrent [[connected]] adds — a check-then-act
    * `remove(id, set)` here could delete a set a fresh connection just
    * registered into, reading a live daemon as Offline. */
  def disconnected(id: String, sock: java.net.Socket): Unit = {
    live.computeIfPresent(id, (_, set) => {
      set.remove(sock)
      if (set.isEmpty) null else set
    })
    cp.setDaemonLastSeen(id, now())
    ()
  }

  def isOnline(id: String): Boolean = {
    val s = live.get(id)
    s != null && !s.isEmpty
  }

  /** Close every live connection of one daemon — `delete_daemon`'s
    * shutdown of the tracked socket (`mod.rs:574-577`). Returns the
    * number of sockets closed. */
  def kick(id: String): Int = {
    val s = live.remove(id)
    if (s == null) 0
    else {
      var n = 0
      s.forEach { sock =>
        try sock.close() catch { case _: Exception => () }
        n += 1
      }
      n
    }
  }
}
