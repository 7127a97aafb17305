package graft.tools

import graft.graph.MetisIO
import graft.partition.SeqPartitioner

/** Dev tool: partition the vendored Walshaw `data` graph (k=16, eps=0.03) with the
  * sequential partitioner and print cut/imbalance — mirrors the reference's e2e
  * quality bound `cut <= 2000` (`tests/endtoend/dist_endtoend_test.cc:133-138`).
  */
object QualityCheck {
  def main(args: Array[String]): Unit = {
    val res = args.headOption.getOrElse("/data.graph")
    val k = if (args.length > 1) args(1).toInt else 16
    val eps = if (args.length > 2) args(2).toDouble else 0.03
    val g = MetisIO.readCsrResource(res)
    println(s"graph: n=${g.n} m=${g.m / 2} totalW=${g.totalNodeWeight}")
    for (seed <- 0L to 2L) {
      val t0 = System.nanoTime()
      val r = SeqPartitioner.partitionKway(g, k, eps, seed)
      val ms = (System.nanoTime() - t0) / 1e6
      val bw = SeqPartitioner.blockWeights(g, r.part, k)
      val perfect = math.ceil(g.totalNodeWeight.toDouble / k)
      val imb = bw.max / perfect - 1.0
      println(f"seed=$seed cut=${r.cut} imbalance=$imb%.4f maxW=${bw.max} time=$ms%.0fms feasible=${imb <= eps + 1e-9}")
    }
  }
}
