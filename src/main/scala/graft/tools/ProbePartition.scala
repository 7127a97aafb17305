package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbePartition {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.graph.Graphs.bipartite(spark, sfDir).persist()
    edges.count()
    val preset = sys.env.getOrElse("SPARK_GRAFT_PRESET", "default")
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "16").toInt
    val t0 = System.nanoTime()
    val res = graft.partition.Partitioner(edges).setK(k).setEpsilon(0.03).setSeed(42L)
      .setPreset(preset)
      .computePartition(spark)
    val populated = res.blockWeights.count(_ > 0L)
    println(s"PARTITION k=$k ${(System.nanoTime()-t0)/1e9}s cut=${res.cut} imb=${res.imbalance} " +
      s"feasible=${res.feasible} populated=$populated/${res.blockWeights.length}")
    println("STAGES " + res.stageTimes.map { case (k, v) => f"$k=$v%.1f" }.mkString(" "))
    spark.stop()
  }
}
