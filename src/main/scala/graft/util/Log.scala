package graft.util

/** Tiny stderr progress logger for the iterative drivers (superstep-level timing).
  * Disable with GRAFT_LOG=0.
  */
object Log {
  @volatile var enabled: Boolean = sys.env.get("GRAFT_LOG").forall(_ != "0")
  private val t0 = System.nanoTime()
  def info(msg: => String): Unit =
    if (enabled) System.err.println(f"[graft ${(System.nanoTime() - t0) / 1e9}%8.1fs] $msg")
}
