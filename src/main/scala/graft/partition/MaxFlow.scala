package graft.partition

/** Dinic max-flow / min-cut on small driver-side networks — the kernel of the
  * pair-region flow refiner (SURVEY O21, reference `kaminpar-shm/refinement/flow`
  * role). Undirected edges are modeled as arc pairs that serve as each other's
  * residuals (cap c both ways), the standard undirected min-cut construction.
  *
  * Sizes here are border regions (<= ~50k nodes), where Dinic's blocking-flow
  * phases run in milliseconds.
  */
final class Dinic(n: Int, arcCapacity: Int) {
  private val head = Array.fill(n)(-1)
  private val nxt = new Array[Int](arcCapacity)
  private val to = new Array[Int](arcCapacity)
  private val cap = new Array[Long](arcCapacity)
  private var m = 0

  /** Undirected edge u-v with capacity c each way (arcs are mutual residuals). */
  def addUndirected(u: Int, v: Int, c: Long): Unit = {
    to(m) = v; cap(m) = c; nxt(m) = head(u); head(u) = m; m += 1
    to(m) = u; cap(m) = c; nxt(m) = head(v); head(v) = m; m += 1
  }

  /** Directed arc u->v cap c (residual v->u starts at 0). */
  def addDirected(u: Int, v: Int, c: Long): Unit = {
    to(m) = v; cap(m) = c; nxt(m) = head(u); head(u) = m; m += 1
    to(m) = u; cap(m) = 0L; nxt(m) = head(v); head(v) = m; m += 1
  }

  private val level = new Array[Int](n)
  private val it = new Array[Int](n)
  private val queue = new Array[Int](n)

  private def bfs(s: Int, t: Int): Boolean = {
    java.util.Arrays.fill(level, -1)
    var qh = 0; var qt = 0
    queue(qt) = s; qt += 1; level(s) = 0
    while (qh < qt) {
      val u = queue(qh); qh += 1
      var e = head(u)
      while (e >= 0) {
        if (cap(e) > 0 && level(to(e)) < 0) {
          level(to(e)) = level(u) + 1
          queue(qt) = to(e); qt += 1
        }
        e = nxt(e)
      }
    }
    level(t) >= 0
  }

  private def dfs(u: Int, t: Int, f: Long): Long = {
    if (u == t) return f
    var res = 0L
    var e = it(u)
    while (e >= 0 && res < f) {
      if (cap(e) > 0 && level(to(e)) == level(u) + 1) {
        val d = dfs(to(e), t, math.min(f - res, cap(e)))
        if (d > 0) {
          cap(e) -= d
          cap(e ^ 1) += d
          res += d
        } else level(to(e)) = -1 // dead end
      }
      if (res < f) { e = nxt(e); it(u) = e }
    }
    res
  }

  def maxflow(s: Int, t: Int): Long = {
    var flow = 0L
    while (bfs(s, t)) {
      var u = 0
      while (u < n) { it(u) = head(u); u += 1 }
      var f = dfs(s, t, Long.MaxValue)
      while (f > 0) { flow += f; f = dfs(s, t, Long.MaxValue) }
    }
    flow
  }

  /** After maxflow: nodes residually reachable from s (the s side of a min cut). */
  def minCutSide(s: Int): Array[Boolean] = {
    val side = new Array[Boolean](n)
    var qh = 0; var qt = 0
    queue(qt) = s; qt += 1; side(s) = true
    while (qh < qt) {
      val u = queue(qh); qh += 1
      var e = head(u)
      while (e >= 0) {
        if (cap(e) > 0 && !side(to(e))) {
          side(to(e)) = true
          queue(qt) = to(e); qt += 1
        }
        e = nxt(e)
      }
    }
    side
  }

  /** Iterate residual successors of u (arcs with remaining capacity). */
  def foreachResidual(u: Int)(f: Int => Unit): Unit = {
    var e = head(u)
    while (e >= 0) {
      if (cap(e) > 0) f(to(e))
      e = nxt(e)
    }
  }

  /** After maxflow: nodes that can residually REACH t — the complement is the s side
    * of the OTHER extreme min cut (any assignment between the two extremes is a min
    * cut; the two give the balance options).
    */
  def minCutSideT(t: Int): Array[Boolean] = {
    val reach = new Array[Boolean](n)
    var qh = 0; var qt = 0
    queue(qt) = t; qt += 1; reach(t) = true
    while (qh < qt) {
      val v = queue(qh); qh += 1
      var e = head(v)
      while (e >= 0) {
        // arc e: v -> u; its pair e^1: u -> v with residual cap(e^1)
        val u = to(e)
        if (cap(e ^ 1) > 0 && !reach(u)) {
          reach(u) = true
          queue(qt) = u; qt += 1
        }
        e = nxt(e)
      }
    }
    reach
  }
}
