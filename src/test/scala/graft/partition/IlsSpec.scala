package graft.partition

import graft.SparkFunSuite
import graft.model.CsrGraph
import scala.util.Random

/** ILS basin hopping (round-5 driver-path quality lever): must never worsen the
  * incumbent (feasible, cut), must keep feasibility and the full-k contract, and
  * must be deterministic in the seed.
  */
class IlsSpec extends SparkFunSuite {

  private def randomCsr(n: Int, avgDeg: Int, seed: Long): CsrGraph = {
    val rand = new Random(seed)
    val es = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var i = 0
    while (i < n * avgDeg / 2) {
      val u = rand.nextInt(n); val v = rand.nextInt(n)
      if (u != v) es += ((u.toLong, v.toLong, 1L + rand.nextInt(3)))
      i += 1
    }
    val sym = es.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
    CsrGraph.fromEdges(n, sym.toArray, Array.fill(n)(1L))
  }

  test("never worsens a feasible incumbent; keeps feasibility and full k") {
    val g = randomCsr(800, 8, 1L)
    val k = 8
    val perfect = math.ceil(g.totalNodeWeight.toDouble / k).toLong
    val lmax = math.max(((1.03) * perfect).toLong, perfect + g.maxNodeWeight)
    val part = Array.tabulate(g.n)(_ % k)
    SeqPartitioner.forceFeasible(g, part, k, Array.fill(k)(lmax))
    val before = SeqPartitioner.cut(g, part)
    SeqPartitioner.ilsRefine(g, part, k, lmax, seed = 7L, kicks = 6)
    val after = SeqPartitioner.cut(g, part)
    assert(after <= before, s"ILS worsened the cut: $before -> $after")
    assert(SeqPartitioner.blockWeights(g, part, k).max <= lmax)
    assert(part.distinct.length === k)
  }

  test("deterministic in the seed") {
    val g = randomCsr(500, 6, 2L)
    val k = 4
    val perfect = math.ceil(g.totalNodeWeight.toDouble / k).toLong
    val lmax = math.max(((1.03) * perfect).toLong, perfect + g.maxNodeWeight)
    def run(seed: Long): Array[Int] = {
      val p = Array.tabulate(g.n)(_ % k)
      SeqPartitioner.forceFeasible(g, p, k, Array.fill(k)(lmax))
      SeqPartitioner.ilsRefine(g, p, k, lmax, seed, kicks = 4)
      p
    }
    assert(run(3L).toSeq === run(3L).toSeq)
  }

  test("no-op on kicks = 0 and on an infeasible incumbent") {
    val g = randomCsr(200, 4, 3L)
    val k = 4
    val p = Array.tabulate(g.n)(_ % k)
    val snapshot = p.clone()
    SeqPartitioner.ilsRefine(g, p, k, lmax = 1L, seed = 1L, kicks = 4) // all blocks over
    assert(p.toSeq === snapshot.toSeq)
    SeqPartitioner.ilsRefine(g, p, k, lmax = Long.MaxValue, seed = 1L, kicks = 0)
    assert(p.toSeq === snapshot.toSeq)
  }
}
