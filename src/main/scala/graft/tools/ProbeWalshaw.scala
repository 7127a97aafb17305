package graft.tools

import graft.graph.MetisIO
import graft.partition.SeqPartitioner

/** Dev probe: driver-side cut-quality experiments on the Walshaw `data` fixture
  * (n=2851, m=15093) at k=16, eps=0.03 — the reference's own e2e quality instance
  * (`/root/reference/tests/endtoend/dist_endtoend_test.cc:133-138`; KaMinPar-typical
  * cut ~750-800). No Spark session: pure sequential experimentation loop.
  */
object ProbeWalshaw {
  def main(args: Array[String]): Unit = {
    val csr = MetisIO.readCsrFile(
      args.headOption.getOrElse("src/test/resources/data.graph"))
    val k = 16
    val eps = 0.03
    val perfect = math.ceil(csr.totalNodeWeight.toDouble / k).toLong
    val lmax = math.max(((1.0 + eps) * perfect).toLong, perfect + csr.maxNodeWeight)
    println(s"n=${csr.n} m=${csr.m} perfect=$perfect lmax=$lmax")
    for (kk <- Seq(16); seed <- Seq(0L, 1L, 2L, 3L, 7L, 42L, 99L, 123L)) {
      val t0 = System.nanoTime()
      val r = SeqPartitioner.partitionKwayBest(csr, kk, eps, seed, attempts = 3)
      val perfK = math.ceil(csr.totalNodeWeight.toDouble / kk).toLong
      val lmaxK = math.max(((1.0 + eps) * perfK).toLong, perfK + csr.maxNodeWeight)
      val bw = SeqPartitioner.blockWeights(csr, r.part, kk)
      println(f"k=$kk%2d seed=$seed%3d cut=${r.cut}%6d feasible=${bw.max <= lmaxK} (${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
  }
}
