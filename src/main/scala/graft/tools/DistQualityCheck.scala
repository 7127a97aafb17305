package graft.tools

import graft.graph.MetisIO
import graft.partition.Partitioner
import org.apache.spark.sql.SparkSession

/** Dev tool: run the FULL distributed pipeline (coarsen -> driver IP -> refine) on the
  * Walshaw `data` fixture with a tiny driver threshold to force distributed levels.
  */
object DistQualityCheck {
  def main(args: Array[String]): Unit = {
    val threshold = if (args.nonEmpty) args(0).toLong else 300L
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val csr = MetisIO.readCsrResource("/data.graph")
    val edges = MetisIO.readEdges(spark, csr)
    for (seed <- Seq(0L, 1L)) {
      val t0 = System.nanoTime()
      val res = Partitioner(edges).setK(16).setEpsilon(0.03).setSeed(seed)
        .setDriverThreshold(threshold).computePartition(spark)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[dist] seed=$seed thr=$threshold cut=${res.cut} imb=${res.imbalance}%.4f feasible=${res.feasible} time=$ms%.0fms")
    }
    spark.stop()
  }
}
