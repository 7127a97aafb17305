package graft.partition

import graft.model.CsrGraph
import org.scalatest.funsuite.AnyFunSuite

/** Pair-region flow refinement (O21): min-cut optimality on corridors where
  * move-based FM is stuck, and the most-balanced-min-cut search at tight caps.
  * Pure driver kernel — no Spark session needed.
  */
class FlowRefineSpec extends AnyFunSuite {

  private def csr(n: Int, undirected: Seq[(Int, Int, Long)]): CsrGraph = {
    val both = undirected.flatMap { case (a, b, w) =>
      Seq((a.toLong, b.toLong, w), (b.toLong, a.toLong, w))
    }
    CsrGraph.fromEdges(n, both.toArray, Array.fill(n)(1L))
  }

  test("kernel moves the cut to the light corridor edge") {
    // path 0-1-2-3: heavy 0-1 (5), light 1-2 (1), heavy 2-3 (5); S glued to 0, T to 3
    val g = csr(4, Seq((0, 1, 5L), (1, 2, 1L), (2, 3, 5L)))
    val side = Array(0, 1, 1, 1) // current cut = the heavy 0-1 edge = 5
    val ext0 = Array(10L, 0L, 0L, 0L)
    val ext1 = Array(0L, 0L, 0L, 10L)
    val delta = FlowRefine.kernel(g, side, ext0, ext1,
      fixed0 = 1L, fixed1 = 1L, max0 = 4L, max1 = 4L)
    assert(delta === 1L - 5L, s"expected min cut 1 (delta -4), got delta $delta")
    assert(side.toSeq === Seq(0, 0, 1, 1))
  }

  test("most balanced min cut: ties resolved inside the feasible window") {
    // path of 6 unit nodes, all edges weight 1: every edge is a min cut (value 1);
    // caps force w0 = w1 = 3, so the balanced tie (between 2 and 3) must win
    val g = csr(6, (0 until 5).map(i => (i, i + 1, 1L)))
    val side = Array(0, 1, 1, 1, 1, 1) // cut value already 1, but w0=1 < lo=3
    val ext0 = Array(1L, 0L, 0L, 0L, 0L, 0L)
    val ext1 = Array(0L, 0L, 0L, 0L, 0L, 1L)
    // current pair cut: edge 0-1 crossing (1) + no attachment crossing = 1; flow min
    // cut is also 1, so delta = 0 — but the assignment must still move to balance?
    // No: kernel only applies on STRICT improvement. Start from a worse state:
    val side2 = Array(0, 1, 0, 1, 0, 1) // crossing edges: 5 of them
    val delta = FlowRefine.kernel(g, side2, ext0, ext1,
      fixed0 = 0L, fixed1 = 0L, max0 = 3L, max1 = 3L)
    assert(delta < 0, s"expected improvement, got $delta")
    assert(side2.count(_ == 0) === 3, s"balance window requires 3|3, got ${side2.toSeq}")
    // contiguous split (a single crossing edge)
    val crossings = (0 until 5).count(i => side2(i) != side2(i + 1))
    assert(crossings === 1, s"expected one crossing, got ${side2.toSeq}")
  }

  test("infeasible min cuts are rejected (side weights would break caps)") {
    // star: center 0 with 3 leaves, all edges weight 1; S on leaf 1, T on leaf 2.
    // Any improvement would shift weight beyond the tight caps -> kernel must reject.
    val g = csr(4, Seq((0, 1, 1L), (0, 2, 1L), (0, 3, 1L)))
    val side = Array(0, 0, 1, 1)
    val before = side.clone()
    val ext0 = Array(0L, 5L, 0L, 0L)
    val ext1 = Array(0L, 0L, 5L, 0L)
    val delta = FlowRefine.kernel(g, side, ext0, ext1,
      fixed0 = 10L, fixed1 = 0L, max0 = 12L, max1 = 1L)
    // max1=1 but T side already holds 2 region nodes: any assignment fails -> no-op
    assert(delta === 0L)
    assert(side.toSeq === before.toSeq)
  }

  test("refineRegion on a pair graph: corridor rerouting beats the FM-stuck state") {
    // two 4-cliques joined by a 2-edge bridge through nodes 3 and 4; blocks split
    // mid-bridge badly: block 0 = {0,1,2,3,4}, block 1 = {5,6,7} puts the cut at
    // the clique boundary (3 edges) instead of the bridge (1 edge... construct:)
    val cliqueA = for { a <- 0 until 4; b <- a + 1 until 4 } yield (a, b, 1L)
    val cliqueB = for { a <- 4 until 8; b <- a + 1 until 8 } yield (a, b, 1L)
    val g = csr(8, cliqueA ++ cliqueB ++ Seq((3, 4, 1L)))
    val side = Array(0, 0, 0, 0, 0, 1, 1, 1) // cut = node4's clique edges = 3
    val delta = FlowRefine.refineRegion(g, side, delta = 3, max0 = 5L, max1 = 5L)
    assert(delta === 1L - 3L, s"expected bridge cut (delta -2), got $delta")
    assert(side.toSeq === Seq(0, 0, 0, 0, 1, 1, 1, 1))
  }
}
