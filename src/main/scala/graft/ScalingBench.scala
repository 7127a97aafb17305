package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.Graphs
import graft.ops.PageRank
import graft.util.Log

/** Two-parallelism scaling evidence (BASELINE.json: throughput scaling efficiency
  * >= 0.8 from N to 4N executors, evidenced in this sandbox by running the identical
  * job at local[N] and local[4N] on the same input and seed).
  *
  * Per level: fresh SparkSession, an untimed warmup pass (JIT/page-cache), then timed
  * PageRank supersteps and timed distributed partition-refinement supersteps.
  * Efficiency(N -> 4N) = (T_N / T_4N) / 4.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val levels = (if (args.nonEmpty) args(0) else "8,32").split(",").map(_.trim.toInt)
    Log.enabled = false

    final case class Res(cpus: Int, m: Long, tPr: Double, tRefine: Double)
    val out = levels.map { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      val edges = Graphs.bipartite(spark, sfDir).persist()
      val m = edges.count()

      // warmup (untimed): exercises the same code paths at a smaller iteration count
      PageRank.run(spark, edges, iterations = 2).agg(sum(col("pr"))).first()

      val t0 = System.nanoTime()
      PageRank.run(spark, edges, iterations = 5).agg(sum(col("pr"))).first()
      val tPr = (System.nanoTime() - t0) / 1e9

      // partition once (untimed), then time refinement supersteps on the finest level
      val part = graft.partition.Partitioner(edges).setK(16).setEpsilon(0.03).setSeed(42L)
        .computePartition(spark)
      val nodeW = edges.select(col("src").as("node")).distinct().withColumn("weight", lit(1L))
      val t1 = System.nanoTime()
      graft.partition.DistRefiner.lpRefine(
        spark, edges, nodeW, part.assignment, 16, part.ctx.maxBlockWeight,
        maxIter = 5, seed = 7L
      ).count()
      val tRefine = (System.nanoTime() - t1) / 1e9

      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      Res(cpus, m, tPr, tRefine)
    }

    out.foreach { r =>
      println(f"""{"cpus":${r.cpus},"edges":${r.m},"pagerank5_sec":${r.tPr}%.2f,"refine5_sec":${r.tRefine}%.2f,"pagerank_eps":${(r.m * 5 / r.tPr).toLong},"refine_eps":${(r.m * 5 / r.tRefine).toLong}}""")
    }
    if (out.length == 2) {
      val (lo, hi) = (out(0), out(1))
      val factor = hi.cpus.toDouble / lo.cpus
      val effPr = (lo.tPr / hi.tPr) / factor
      val effRef = (lo.tRefine / hi.tRefine) / factor
      println(f"""{"scaling":"local[${lo.cpus}]->local[${hi.cpus}]","factor":$factor%.1f,"pagerank_efficiency":$effPr%.3f,"refine_efficiency":$effRef%.3f}""")
    }
  }
}
