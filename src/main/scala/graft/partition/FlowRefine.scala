package graft.partition

import graft.model.CsrGraph

/** Pair-region flow refinement (SURVEY O21, the reference's `refinement/flow`
  * role re-derived for border regions): on a block pair's border region, the minimum
  * S-T cut — with the fixed exteriors contracted into the terminals via attachment
  * capacities — is the optimal 2-way cut THROUGH that corridor, strictly stronger
  * than any move-based local search. Balance is handled by trying both extreme min
  * cuts (S-closest and T-closest); an infeasible flow result is rejected and the
  * move-based result stands, so the refiner never worsens anything.
  *
  * Shared kernel: the driver path calls [[refineRegion]] on a pair-induced subgraph
  * (region = nodes within `delta` hops of the cut); the distributed path calls
  * [[kernel]] directly on its collected border region + attachments.
  */
object FlowRefine {

  /** Region graphs above this arc count skip flow (Dinic stays sub-second below). */
  val MaxFlowArcs = 4000000

  /** Flow step on a region with attachments; mutates `side` if a feasible
    * improvement is found. Returns the achieved pair-cut delta (<= 0).
    */
  def kernel(
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
    if (n == 0) return 0L
    // current pair cut: region-crossing edges (double-counted by the CSR loop,
    // halved below) + attachments toward the other side (counted once)
    var curCut = 0L
    var regionCross = 0L
    var u = 0
    while (u < n) {
      var e = g.xadj(u)
      while (e < g.xadj(u + 1)) {
        if (side(g.adjncy(e)) != side(u)) regionCross += g.adjwgt(e)
        e += 1
      }
      curCut += (if (side(u) == 0) ext1(u) else ext0(u))
      u += 1
    }
    curCut += regionCross / 2

    // arc budget: every undirected region edge once + one terminal arc per nonzero
    // attachment (2 slots each in the arena)
    var undirected = 0
    u = 0
    while (u < n) {
      var e = g.xadj(u)
      while (e < g.xadj(u + 1)) { if (g.adjncy(e) > u) undirected += 1; e += 1 }
      u += 1
    }
    var termArcs = 0
    u = 0
    while (u < n) {
      if (ext0(u) > 0) termArcs += 1
      if (ext1(u) > 0) termArcs += 1
      u += 1
    }
    val arcSlots = 2 * (undirected + termArcs) + 4
    if (arcSlots > MaxFlowArcs) return 0L

    val S = n; val T = n + 1
    val net = new Dinic(n + 2, arcSlots)
    u = 0
    while (u < n) {
      var e = g.xadj(u)
      while (e < g.xadj(u + 1)) {
        val v = g.adjncy(e)
        if (v > u) net.addUndirected(u, v, g.adjwgt(e))
        e += 1
      }
      if (ext0(u) > 0) net.addUndirected(S, u, ext0(u))
      if (ext1(u) > 0) net.addUndirected(u, T, ext1(u))
      u += 1
    }
    val flowCut = net.maxflow(S, T)
    if (flowCut >= curCut) return 0L

    // MOST BALANCED MIN CUT (the reference's `flow/most_balanced_minimum_cuts` role):
    // every S-side set C with sReach ⊆ C, C ∩ tReach = ∅ that is CLOSED under
    // residual successors is a min cut. Free nodes (neither extreme) condense into
    // SCCs of the residual digraph; suffixes of a topological order are exactly the
    // closed additions — walk them until the side-0 weight lands in the feasible
    // window [total - max1, max0].
    val sCut = net.minCutSide(S)
    val tReach = net.minCutSideT(T)
    var w0 = fixed0
    var totalAll = fixed0 + fixed1
    var i = 0
    while (i < n) {
      if (sCut(i)) w0 += g.vwgt(i)
      totalAll += g.vwgt(i)
      i += 1
    }
    val lo = math.max(1L, totalAll - max1)
    val hi = math.min(max0, totalAll - 1L)
    if (w0 > hi) return 0L // even the minimal S side overloads block 0

    val free = (0 until n).filter(i0 => !sCut(i0) && !tReach(i0)).toArray
    val inS = sCut.clone()
    if (w0 < lo || free.nonEmpty) {
      // residual digraph among free nodes: arc u->v iff residual cap > 0
      val fIdx = new java.util.HashMap[Int, Int]()
      i = 0
      while (i < free.length) { fIdx.put(free(i), i); i += 1 }
      val adj = Array.fill(free.length)(List.empty[Int])
      val radj = Array.fill(free.length)(List.empty[Int])
      i = 0
      while (i < free.length) {
        val u2 = free(i)
        net.foreachResidual(u2) { v =>
          if (v < n && fIdx.containsKey(v)) {
            val j = fIdx.get(v)
            if (j != i) { adj(i) ::= j; radj(j) ::= i }
          }
        }
        i += 1
      }
      // Kosaraju: order by finish time on adj, then SCCs on radj
      val visited = new Array[Boolean](free.length)
      val order = new Array[Int](free.length)
      var oPos = 0
      val stack = new java.util.ArrayDeque[(Int, List[Int])]()
      i = 0
      while (i < free.length) {
        if (!visited(i)) {
          visited(i) = true
          stack.push((i, adj(i)))
          while (!stack.isEmpty) {
            val (u2, rest) = stack.pop()
            rest match {
              case v :: tail =>
                stack.push((u2, tail))
                if (!visited(v)) { visited(v) = true; stack.push((v, adj(v))) }
              case Nil =>
                order(oPos) = u2; oPos += 1
            }
          }
        }
        i += 1
      }
      val comp = Array.fill(free.length)(-1)
      var nComp = 0
      i = free.length - 1
      while (i >= 0) {
        val r = order(i)
        if (comp(r) < 0) {
          val st = new java.util.ArrayDeque[Integer]()
          st.push(r); comp(r) = nComp
          while (!st.isEmpty) {
            val u2 = st.pop().intValue
            radj(u2).foreach { v => if (comp(v) < 0) { comp(v) = nComp; st.push(v) } }
          }
          nComp += 1
        }
        i -= 1
      }
      // comp ids are assigned in REVERSE topological order of the condensation
      // (Kosaraju property: component 0 is a source). A suffix of the topo order =
      // components nComp-1, nComp-2, ... — each addition stays successor-closed.
      val compW = new Array[Long](nComp)
      i = 0
      while (i < free.length) { compW(comp(i)) += g.vwgt(free(i)); i += 1 }
      var c = nComp - 1
      while (c >= 0 && w0 < lo) {
        w0 += compW(c)
        var j = 0
        while (j < free.length) {
          if (comp(j) == c) inS(free(j)) = true
          j += 1
        }
        c -= 1
      }
    }
    if (w0 < lo || w0 > hi) return 0L
    i = 0
    while (i < n) { side(i) = if (inS(i)) 0 else 1; i += 1 }
    flowCut - curCut
  }

  /** Driver-path entry: flow refinement of one block pair inside a full partition.
    * `pairGraph` is the pair-induced subgraph; region = nodes within `delta` hops of
    * the current cut; exterior pair nodes contract into the terminals.
    * Mutates `side` (whole pair array) on improvement; returns the cut delta.
    */
  def refineRegion(
      pairGraph: CsrGraph,
      side: Array[Int],
      delta: Int,
      max0: Long,
      max1: Long
  ): Long = {
    val n = pairGraph.n
    // BFS from cut endpoints, bounded depth
    val dist = Array.fill(n)(Int.MaxValue)
    val queue = new java.util.ArrayDeque[Integer]()
    var u = 0
    while (u < n) {
      var e = pairGraph.xadj(u)
      var boundary = false
      while (e < pairGraph.xadj(u + 1) && !boundary) {
        if (side(pairGraph.adjncy(e)) != side(u)) boundary = true
        e += 1
      }
      if (boundary) { dist(u) = 0; queue.add(u) }
      u += 1
    }
    if (queue.isEmpty) return 0L
    while (!queue.isEmpty) {
      val x = queue.poll()
      if (dist(x) < delta) {
        var e = pairGraph.xadj(x)
        while (e < pairGraph.xadj(x + 1)) {
          val v = pairGraph.adjncy(e)
          if (dist(v) == Int.MaxValue) { dist(v) = dist(x) + 1; queue.add(v) }
          e += 1
        }
      }
    }
    // region: per-side BFS-layer prefix under a WEIGHT budget. Each side must keep
    // at least one node OUTSIDE the region (its terminal anchor — without it the
    // min cut degenerates to "move everything", value 0), and the budget mixes the
    // hard slack (capacity the other side could absorb) with an exploration share
    // that the most-balanced-min-cut search can still place feasibly.
    var w0All = 0L; var w1All = 0L
    u = 0
    while (u < n) {
      if (side(u) == 0) w0All += pairGraph.vwgt(u) else w1All += pairGraph.vwgt(u)
      u += 1
    }
    val budget0 = math.min(w0All - 1, math.max(max1 - w1All, (w0All + 2) / 3))
    val budget1 = math.min(w1All - 1, math.max(max0 - w0All, (w1All + 2) / 3))
    val ordered = (0 until n).filter(dist(_) <= delta).sortBy(i0 => (dist(i0), i0))
    var acc0 = 0L; var acc1 = 0L
    val regionIds = ordered.filter { i0 =>
      if (side(i0) == 0) {
        if (acc0 + pairGraph.vwgt(i0) <= budget0) { acc0 += pairGraph.vwgt(i0); true } else false
      } else {
        if (acc1 + pairGraph.vwgt(i0) <= budget1) { acc1 += pairGraph.vwgt(i0); true } else false
      }
    }.toArray
    if (regionIds.length < 2) return 0L
    val idOf = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < regionIds.length) { idOf.put(regionIds(i), i); i += 1 }
    val edgesBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val ext0 = new Array[Long](regionIds.length)
    val ext1 = new Array[Long](regionIds.length)
    var w0 = 0L; var w1 = 0L
    u = 0
    while (u < n) {
      if (side(u) == 0) w0 += pairGraph.vwgt(u) else w1 += pairGraph.vwgt(u)
      u += 1
    }
    var regW0 = 0L; var regW1 = 0L
    i = 0
    while (i < regionIds.length) {
      val g0 = regionIds(i)
      if (side(g0) == 0) regW0 += pairGraph.vwgt(g0) else regW1 += pairGraph.vwgt(g0)
      var e = pairGraph.xadj(g0)
      while (e < pairGraph.xadj(g0 + 1)) {
        val v = pairGraph.adjncy(e)
        if (idOf.containsKey(v))
          edgesBuf += ((i.toLong, idOf.get(v).toLong, pairGraph.adjwgt(e)))
        else if (side(v) == 0) ext0(i) += pairGraph.adjwgt(e)
        else ext1(i) += pairGraph.adjwgt(e)
        e += 1
      }
      i += 1
    }
    val vw = regionIds.map(pairGraph.vwgt)
    val sub = CsrGraph.fromEdges(regionIds.length, edgesBuf.toArray, vw)
    val subSide = regionIds.map(side)
    val delta0 = kernel(
      sub, subSide, ext0, ext1,
      fixed0 = w0 - regW0, fixed1 = w1 - regW1, max0 = max0, max1 = max1)
    if (delta0 < 0) {
      i = 0
      while (i < regionIds.length) { side(regionIds(i)) = subSide(i); i += 1 }
    }
    delta0
  }
}
