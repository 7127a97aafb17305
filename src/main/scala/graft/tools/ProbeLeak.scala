package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: replicate PersistHygieneSpec's leak check and print WHICH RDDs
  * remain pinned after computePartition (name + creation call site).
  */
object ProbeLeak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.Log.enabled = false
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val n = 200
    val edgeSet = scala.collection.mutable.Set.empty[(Long, Long)]
    (0 until n).foreach(i => edgeSet += ((i.toLong, ((i + 1) % n).toLong)))
    (0 until 3 * n).foreach { _ =>
      val a = rnd.nextInt(n); val b = rnd.nextInt(n)
      if (a != b) edgeSet += ((math.min(a, b).toLong, math.max(a, b).toLong))
    }
    val edges = edgeSet.toSeq.flatMap { case (a, b) => Seq((a, b, 1L), (b, a, 1L)) }
      .toDF("src", "dst", "w")
    var trial = 0
    while (trial < 6) {
      for (hub <- Seq(0L, 4L)) {
        val before = spark.sparkContext.getPersistentRDDs.keySet
        graft.partition.Partitioner(edges).setK(4).setEpsilon(0.05).setSeed(1L)
          .setDriverThreshold(60L).setHubDegreeThreshold(hub).computePartition(spark)
        val after = spark.sparkContext.getPersistentRDDs
        val leaked = after.keySet -- before
        println(s"trial=$trial hub=$hub leaked=${leaked.size}")
        leaked.foreach { id =>
          val rdd = after(id)
          println(s"  id=$id rdd=${rdd.toString.take(120)}")
        }
      }
      trial += 1
    }
    spark.stop()
  }
}
