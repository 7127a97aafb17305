package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Overhead probe (guide §1): where does the wall clock of the bench queries go at
  * sf0.1 on local[cpus]? Counts jobs/stages/tasks and sums executor task time, GC
  * time, shuffle fetch wait and serialization time via a SparkListener, per labeled
  * phase. Pure diagnostics — not part of the frozen bench.
  */
object ProbeOverhead {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.util.Log.enabled = false
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    // extra confs via PROBE_CONFS="k=v,k=v" (diagnostic A/B)
    sys.env.get("PROBE_CONFS").foreach(_.split(",").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      b = b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTime = new AtomicLong(0) // ms
    val gcTime = new AtomicLong(0)
    val fetchWait = new AtomicLong(0)
    val serTime = new AtomicLong(0)
    val deserTime = new AtomicLong(0)
    val schedDelay = new AtomicLong(0)
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = s.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(0L)
        val run = si.taskMetrics.executorRunTime
        stageInfo.put(si.stageId, (si.name.takeWhile(_ != '\n').take(60), si.numTasks, wall, run))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTime.addAndGet(m.executorRunTime)
          gcTime.addAndGet(m.jvmGCTime)
          fetchWait.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          serTime.addAndGet(m.resultSerializationTime)
          deserTime.addAndGet(m.executorDeserializeTime)
          val total = t.taskInfo.duration
          schedDelay.addAndGet(math.max(0,
            total - m.executorRunTime - m.executorDeserializeTime - m.resultSerializationTime))
        }
      }
    })

    def phase[A](name: String)(f: => A): A = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTime.set(0); gcTime.set(0)
      fetchWait.set(0); serTime.set(0); deserTime.set(0); schedDelay.set(0)
      stageInfo.clear()
      val t0 = System.nanoTime()
      val a = f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      println(f"PHASE $name%-28s wall=$wall%7.2fs jobs=${jobs.get}%3d stages=${stages.get}%4d tasks=${tasks.get}%5d " +
        f"taskTime=${taskTime.get / 1000.0}%8.2fs gc=${gcTime.get / 1000.0}%6.2fs fetchWait=${fetchWait.get / 1000.0}%5.2fs " +
        f"deser=${deserTime.get / 1000.0}%6.2fs schedDelay=${schedDelay.get / 1000.0}%7.2fs")
      import scala.jdk.CollectionConverters._
      stageInfo.asScala.toSeq.sortBy(-_._2._4).take(12).foreach {
        case (id, (nm, nt, wall, run)) =>
          println(f"    stage $id%4d $nm%-60s tasks=$nt%4d wall=${wall / 1000.0}%6.2fs run=${run / 1000.0}%7.2fs")
      }
      a
    }

    import graft.graph.Graphs
    val edges = phase("graph_build") {
      val e = Graphs.bipartite(spark, sfDir).persist()
      e.count()
      e
    }
    phase("pagerank5") {
      graft.ops.PageRank.run(spark, edges, iterations = 5)
        .agg(sum(col("pr"))).first()
    }
    phase("pagerank5_again") {
      graft.ops.PageRank.run(spark, edges, iterations = 5)
        .agg(sum(col("pr"))).first()
    }
    phase("cc") {
      graft.ops.ConnectedComponents.run(spark, edges)
        .agg(countDistinct(col("component"))).first()
    }
    phase("triangles") {
      graft.ops.Triangles.count(spark, Graphs.copurchase(spark, sfDir)).first()
    }
    val partRes = phase("partition_k16") {
      graft.partition.Partitioner(edges).setK(16).setEpsilon(0.03).setSeed(42L)
        .computePartition(spark)
    }
    phase("refine5") {
      val nodeW = edges.select(col("src").as("node")).distinct()
        .withColumn("weight", lit(1L))
      val eRef = edges.repartition(col("dst")).persist()
      graft.partition.DistRefiner.lpRefine(
        spark, eRef, nodeW, partRes.assignment, 16, partRes.ctx.maxBlockWeight,
        maxIter = 5, seed = 7L).count()
    }
    phase("minhash_dedup") {
      graft.textops.Dedup.verifyJaccard(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        graft.textops.Dedup.lshCandidates(spark.read.parquet(s"$sfDir/documents.parquet"))
      ).filter(col("jaccard") >= 0.5).count()
    }
    phase("knn_brute") {
      val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.sim.Similarity.bruteForceKnn(v.filter(col("id") < 10), v, 5).count()
    }
    spark.stop()
  }
}
