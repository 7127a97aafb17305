package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runs pagerank5 in a loop so thread dumps can sample steady-state task behavior. */
object ProbeLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.util.Log.enabled = false
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.graph.Graphs.bipartite(spark, sfDir).persist()
    edges.count()
    var i = 0
    while (i < 30) {
      val t0 = System.nanoTime()
      graft.ops.PageRank.run(spark, edges, iterations = 5).agg(sum(col("pr"))).first()
      println(f"loop $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      i += 1
    }
    spark.stop()
  }
}
