package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: Walshaw `data` k=16 eps=0.03 cut across seeds on both paths — the
  * quality gauge the round verdicts grade (driver / forced-distributed).
  */
object ProbeWalshaw {
  def main(args: Array[String]): Unit = {
    val seeds = if (args.nonEmpty) args(0).split(",").map(_.toLong).toSeq else Seq(0L, 1L, 2L, 3L)
    val dist = args.length > 1 && args(1) == "dist"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.Log.enabled = false
    val csr = graft.graph.MetisIO.readCsrResource("/data.graph")
    val edges = graft.graph.MetisIO.readEdges(spark, csr)
    val threshold = if (dist) 300L else 100000L
    // ILS-depth experiments on the driver path (dev knob; presets carry the ship values)
    val preset = sys.env.get("SPARK_GRAFT_ILS_KICKS").map(_.toInt)
      .map(k => graft.partition.Preset.Default.copy(ilsKicks = k))
      .getOrElse(graft.partition.Preset.Default)
    val cuts = seeds.map { s =>
      val t0 = System.nanoTime()
      val res = graft.partition.Partitioner(edges).setK(16).setEpsilon(0.03).setSeed(s)
        .setDriverThreshold(threshold).setPreset(preset).computePartition(spark)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"seed=$s cut=${res.cut} feasible=${res.feasible} imb=${res.imbalance}%.4f t=$t%.1fs")
      res.cut
    }
    println(s"${if (dist) "DIST" else "DRIVER"} cuts: min=${cuts.min} max=${cuts.max} avg=${cuts.sum / cuts.size}")
    spark.stop()
  }
}
