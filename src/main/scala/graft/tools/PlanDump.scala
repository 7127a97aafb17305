package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps `.explain("formatted")` for the bench/declared query plans into a
  * directory (args: outDir [sfDir]) — the r06 optimization evidence files
  * (`plans/r06/<query>_{before,after}.txt`). Pure diagnostics.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    graft.util.Log.enabled = false
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), txt.getBytes("UTF-8"))
      println(s"dumped $name")
    }

    import graft.graph.Graphs
    val edges = Graphs.bipartite(spark, sfDir)
    dump("q01_edges", edges)
    dump("q07_pagerank5", graft.ops.PageRank.run(spark, edges, iterations = 5))
    dump("q06_triangles", {
      // triangle plan without the mid-pipeline Ckpt side effect: orient + 3-way join
      val o = graft.ops.Triangles.orient(Graphs.copurchase(spark, sfDir))
      val e1 = o.as("e1"); val e2 = o.as("e2"); val e3 = o.as("e3")
      e1.join(e2, col("e1.dst") === col("e2.src"))
        .join(e3, col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
        .agg(count(lit(1)).as("triangles"))
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    dump("q17_minhash_dedup",
      graft.textops.Dedup.verifyJaccard(docs, graft.textops.Dedup.lshCandidates(docs))
        .filter(col("jaccard") >= 0.5))
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    dump("q20_knn_brute", graft.sim.Similarity.bruteForceKnn(v.filter(col("id") < 10), v, 5))
    // one refinement superstep's staging plan shape (the lpRefine hot path) is not
    // dumpable as a single DataFrame (driver loop); the per-level entry join is:
    val nodeW = edges.select(col("src").as("node")).distinct().withColumn("weight", lit(1L))
    dump("refine_entry", edges.join(nodeW, col("src") === col("node")))
    spark.stop()
  }
}
