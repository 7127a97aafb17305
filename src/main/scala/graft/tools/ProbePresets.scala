package graft.tools

import graft.graph.MetisIO
import graft.partition.Partitioner
import org.apache.spark.sql.SparkSession

/** Dev tool: preset-ladder (time, cut) on the Walshaw fixture's distributed path —
  * the measurements behind the README ladder table and the PresetSpec bounds.
  */
object ProbePresets {
  def main(args: Array[String]): Unit = {
    val presets = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("fast", "default", "eco", "strong")
    val seeds = if (args.length > 1) args(1).split(",").map(_.toLong).toSeq else Seq(0L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val csr = MetisIO.readCsrResource("/data.graph")
    val edges = MetisIO.readEdges(spark, csr)
    for (seed <- seeds; p <- presets) {
      // "name@N" overrides the preset's vcycle count (escape-depth experiments)
      val (pname, vcOverride) = p.split("@") match {
        case Array(a, b) => (a, Some(b.toInt))
        case _ => (p, None)
      }
      val preset0 = graft.partition.Preset.byName(pname)
      val preset = vcOverride.map(v => preset0.copy(vcycles = v)).getOrElse(preset0)
      val t0 = System.nanoTime()
      val res = Partitioner(edges).setK(16).setEpsilon(0.03).setSeed(seed)
        .setDriverThreshold(300L).setPreset(preset).computePartition(spark)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[preset] seed=$seed preset=$p%-8s cut=${res.cut} feasible=${res.feasible} time=$sec%.1fs")
    }
    spark.stop()
  }
}
