package graft.plans

/** Named fault-injection points for crash-replay verification.
  *
  * An at-least-once composition's contract ("a crash ANYWHERE between
  * these steps converges on replay") is only testable if a test can
  * crash it at exactly the boundary the contract names — timing-based
  * kills race the very steps they try to interleave. Production cost is
  * one volatile map read per named site; nothing arms them outside
  * specs. The pattern is the standard fault-injection discipline of
  * storage engines (failpoints), kept deliberately tiny. */
object Failpoints {
  @volatile private var hooks = Map.empty[String, () => Unit]

  /** Arm `name`: the next [[hit]] of that site runs `hook` (which
    * typically throws once, then disarms itself via a flag). */
  def arm(name: String, hook: () => Unit): Unit =
    synchronized { hooks += name -> hook }

  def disarm(name: String): Unit = synchronized { hooks -= name }

  /** Production call site: no-op unless a spec armed this name. */
  private[graft] def hit(name: String): Unit = hooks.get(name).foreach(_())
}
