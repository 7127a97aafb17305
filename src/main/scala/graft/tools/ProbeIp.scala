package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.CsrGraph
import graft.partition.{DistCoarsener, Partitioner, SeqPartitioner}

/** Dev tool: profile the driver IP stage on the sf0.1 coarse handoff. */
object ProbeIp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.Log.enabled = false
    val edges = graft.graph.Graphs.bipartite(spark, sfDir).persist()
    edges.count()
    val nodeW = edges.select(col("src").as("node")).distinct().withColumn("weight", lit(1L))
    val n = nodeW.count()
    val targetN = math.min(100000L, math.max(512L, n / 4))
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.1fs"); a
    }
    val (_, cE, cW) = time("coarsen") {
      DistCoarsener.coarsen(spark, edges.select(col("src"), col("dst"), col("w")),
        nodeW, 16, 0.03, targetN, 42L, targetM = Partitioner.DriverEdgeCap)
    }
    val coarseNodes = time("collect") {
      cW.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    }
    val idOf = coarseNodes.iterator.map(_._1).zipWithIndex.toMap
    val coarseEdgeArr = time("collectE") {
      cE.collect().map(r => (idOf(r.getLong(0)).toLong, idOf(r.getLong(1)).toLong, r.getLong(2)))
    }
    println(s"coarse n=${coarseNodes.length} m=${coarseEdgeArr.length}")
    val csr = time("csr") {
      CsrGraph.fromEdges(coarseNodes.length, coarseEdgeArr, coarseNodes.map(_._2))
    }
    SeqPartitioner.Trace = true
    time("partitionKway(single, traced)") {
      SeqPartitioner.partitionKway(csr, 16, 0.03, 42L)
    }
    spark.stop()
  }
}
