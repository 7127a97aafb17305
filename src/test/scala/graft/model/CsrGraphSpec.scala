package graft.model

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Focused spec for the r06 primitive CSR build: `fromEdges` replaced a stable
  * tuple sortBy on (src, dst) with per-slice placement + a primitive sort on
  * (dst, input-index)-encoded longs. The contract pinned here: the produced
  * xadj/adjncy/adjwgt are BYTE-IDENTICAL to the reference construction
  * (globally stable-sort the edges by (src, dst), scatter sequentially into
  * slices) — including duplicate (src, dst) edges, whose weights must keep
  * input order.
  */
class CsrGraphSpec extends AnyFunSuite {

  private def referenceBuild(
      n: Int, edges: Array[(Long, Long, Long)], vw: Array[Long]): CsrGraph = {
    val deg = new Array[Int](n)
    edges.foreach { case (s, _, _) => deg(s.toInt) += 1 }
    val xadj = new Array[Int](n + 1)
    var i = 0
    while (i < n) { xadj(i + 1) = xadj(i) + deg(i); i += 1 }
    val adjncy = new Array[Int](edges.length)
    val adjwgt = new Array[Long](edges.length)
    val pos = java.util.Arrays.copyOf(xadj, n)
    val sorted = edges.sortBy(e => (e._1, e._2)) // scala sortBy is stable
    sorted.foreach { case (s, d, w) =>
      val p = pos(s.toInt); adjncy(p) = d.toInt; adjwgt(p) = w; pos(s.toInt) = p + 1
    }
    new CsrGraph(xadj, adjncy, adjwgt, vw)
  }

  test("fromEdges matches the stable (src, dst) tuple-sort reference, including duplicate edges") {
    val rand = new Random(20260822L)
    (0 until 200).foreach { trial =>
      val n = 1 + rand.nextInt(40)
      val m = rand.nextInt(200)
      val edges = Array.fill(m) {
        // skewed weights + deliberate duplicate (src, dst) pairs so the
        // stable-order-of-equal-keys contract is actually exercised
        (rand.nextInt(n).toLong, rand.nextInt(n).toLong, rand.nextInt(5).toLong + 1L)
      }
      val vw = Array.fill(n)(rand.nextInt(3).toLong + 1L)
      val got = CsrGraph.fromEdges(n, edges.clone(), vw)
      val want = referenceBuild(n, edges, vw)
      assert(java.util.Arrays.equals(got.xadj, want.xadj), s"xadj differs (trial $trial)")
      assert(java.util.Arrays.equals(got.adjncy, want.adjncy), s"adjncy differs (trial $trial)")
      assert(java.util.Arrays.equals(got.adjwgt, want.adjwgt), s"adjwgt differs (trial $trial)")
    }
  }

  test("fromEdges handles a hub node (one src owning most edges) and empty graphs") {
    val n = 1000
    val hubEdges = (1 until n).map(d => (0L, d.toLong, d.toLong)).toArray
    val g = CsrGraph.fromEdges(n, hubEdges.reverse, null) // reversed input order
    assert(g.xadj(1) == n - 1)
    assert((1 until n).forall(i => g.adjncy(i - 1) == i && g.adjwgt(i - 1) == i.toLong))
    val empty = CsrGraph.fromEdges(3, Array.empty, null)
    assert(empty.xadj.toSeq == Seq(0, 0, 0, 0))
  }
}
