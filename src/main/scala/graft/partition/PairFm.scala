package graft.partition

import graft.model.CsrGraph
import scala.collection.mutable

/** 2-way FM over a block-pair BORDER REGION with external attachments — the driver
  * kernel of the distributed pairwise refinement (SURVEY O19's distributed analog).
  *
  * The region is a subset of the two blocks' nodes (the border neighborhood); nodes
  * outside the region are FIXED. Their influence enters through per-node attachment
  * weights `ext0`/`ext1` (edge weight from a region node to fixed nodes on side
  * 0/1), and through the side base weights `fixed0`/`fixed1` (total fixed weight per
  * side), so the balance constraint is enforced against the TRUE block weights.
  * Moves inside the pair leave all third-block cut contributions invariant, so
  * optimizing region cut + attachment terms is exact for the global objective.
  *
  * Classic FM (same discipline as [[SeqPartitioner.fmRefine]]): lazy-deletion heaps,
  * negative-gain hill-climbing with best-prefix rollback; only states no worse than
  * the start (overload, then cut) survive.
  */
object PairFm {

  /** Refine `side` in place. Returns the achieved cut DELTA (<= 0) over region +
    * attachment edges (the global cut changes by exactly this much).
    */
  def refine(
      g: CsrGraph,
      side: Array[Int],
      ext0: Array[Long],
      ext1: Array[Long],
      fixed0: Long,
      fixed1: Long,
      max0: Long,
      max1: Long,
      maxPasses: Int = 3
  ): Long = {
    var total = 0L
    var pass = 0
    var improved = true
    while (pass < maxPasses && improved) {
      val delta = onePass(g, side, ext0, ext1, fixed0, fixed1, max0, max1)
      improved = delta < 0L
      total += delta
      pass += 1
    }
    total
  }

  private def onePass(
      g: CsrGraph,
      side: Array[Int],
      ext0: Array[Long],
      ext1: Array[Long],
      fixed0: Long,
      fixed1: Long,
      max0: Long,
      max1: Long
  ): Long = {
    val n = g.n
    val maxW = Array(max0, max1)
    val w = Array(fixed0, fixed1)
    var u = 0
    while (u < n) { w(side(u)) += g.vwgt(u); u += 1 }

    // D-value of u = cut reduction if u switches sides:
    //   (region neighbors on the other side + attachment to the other side)
    // - (region neighbors on own side     + attachment to own side)
    val d = new Array[Long](n)
    var curCut = 0L // region-internal cut + attachment cut (the part moves can change)
    u = 0
    while (u < n) {
      var ext = 0L; var int = 0L
      var i = g.xadj(u)
      while (i < g.xadj(u + 1)) {
        if (side(g.adjncy(i)) != side(u)) ext += g.adjwgt(i) else int += g.adjwgt(i)
        i += 1
      }
      val (attOpp, attOwn) = if (side(u) == 0) (ext1(u), ext0(u)) else (ext0(u), ext1(u))
      d(u) = (ext + attOpp) - (int + attOwn)
      curCut += ext + 2 * attOpp // region edges double-count across the loop; attachments don't
      u += 1
    }
    curCut /= 2
    val startCut = curCut
    def overload(): Long = math.max(0L, w(0) - max0) + math.max(0L, w(1) - max1)
    val startOver = overload()

    val locked = new Array[Boolean](n)
    // primitive FmHeap — identical total order (d desc, node asc) to the tuple
    // PriorityQueue it replaces (r06)
    val heaps = Array.fill(2)(new FmHeap(n + 1))
    u = 0
    while (u < n) { heaps(side(u)).enqueue(d(u), u); u += 1 }

    val moves = new Array[Int](n)
    var nMoves = 0
    var bestPrefix = 0
    var bestCut = curCut
    var bestOver = startOver
    var fruitless = 0
    val FruitlessMoves = math.max(64, n / 8)

    def popValid(s: Int): Int = {
      val h = heaps(s)
      while (h.nonEmpty) {
        val pri = h.headPri; val node = h.headNode
        h.dequeue()
        if (!locked(node) && side(node) == s && d(node) == pri) return node
      }
      -1
    }

    var continue = true
    while (continue && fruitless < FruitlessMoves && nMoves < n) {
      val from =
        if (w(0) > max0) 0
        else if (w(1) > max1) 1
        else {
          def top(s: Int): Long = {
            val h = heaps(s)
            while (h.nonEmpty && {
              val pri = h.headPri; val node = h.headNode
              locked(node) || side(node) != s || d(node) != pri
            }) h.dequeue()
            if (h.isEmpty) Long.MinValue else h.headPri
          }
          val t0v = top(0); val t1v = top(1)
          if (t0v == Long.MinValue && t1v == Long.MinValue) -1
          else if (t0v == t1v) { if (w(0) >= w(1)) 0 else 1 }
          else if (t0v > t1v) 0
          else 1
        }
      if (from < 0) continue = false
      else {
        val to = 1 - from
        var cand = popValid(from)
        var chosen = -1
        val rejected = mutable.ArrayBuffer.empty[Int]
        while (cand >= 0 && chosen < 0) {
          // the source side must keep weight >= 1: a pair move may never EMPTY a
          // block (the full-k contract guarantees k populated blocks)
          if (w(to) + g.vwgt(cand) <= maxW(to) && w(from) - g.vwgt(cand) >= 1L) chosen = cand
          else { rejected += cand; cand = popValid(from) }
        }
        rejected.foreach(r => heaps(from).enqueue(d(r), r))
        if (chosen < 0) continue = false
        else {
          val gain = d(chosen)
          side(chosen) = to
          w(from) -= g.vwgt(chosen)
          w(to) += g.vwgt(chosen)
          curCut -= gain
          locked(chosen) = true
          moves(nMoves) = chosen
          nMoves += 1
          // flip the mover's own attachment orientation for future (it's locked, so
          // only neighbor updates matter) and update neighbor D-values
          var i = g.xadj(chosen)
          while (i < g.xadj(chosen + 1)) {
            val v = g.adjncy(i)
            if (!locked(v)) {
              if (side(v) == to) d(v) -= 2 * g.adjwgt(i)
              else d(v) += 2 * g.adjwgt(i)
              heaps(side(v)).enqueue(d(v), v)
            }
            i += 1
          }
          val over = overload()
          val better = (over < bestOver) || (over == bestOver && curCut < bestCut)
          if (better) { bestCut = curCut; bestOver = over; bestPrefix = nMoves; fruitless = 0 }
          else fruitless += 1
        }
      }
    }
    var mi = nMoves - 1
    while (mi >= bestPrefix) { side(moves(mi)) = 1 - side(moves(mi)); mi -= 1 }
    bestCut - startCut
  }
}
