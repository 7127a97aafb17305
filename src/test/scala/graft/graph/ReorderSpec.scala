package graft.graph

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkFunSuite

/** SURVEY P3 — edge reorder for compression (reference `permutator.cc:215`):
  * neighborhood-ascending layout must measurably shrink the at-rest parquet versus
  * a scrambled layout of the SAME rows, and the adjacency form must carry each
  * neighborhood sorted ascending with aligned weights.
  */
class ReorderSpec extends SparkFunSuite {

  private def dirBytes(p: java.io.File): Long =
    Option(p.listFiles()).map(_.map(f => if (f.isDirectory) dirBytes(f) else f.length()).sum)
      .getOrElse(0L)

  private def contentSig(df: DataFrame): (Long, Long) = {
    val r = df.agg(
      count(lit(1)).as("c"),
      bit_xor(xxhash64(col("src"), col("dst"), col("w"))).as("x")).first()
    (r.getLong(0), r.getLong(1))
  }

  test("compression reorder shrinks parquet vs scrambled layout, same rows") {
    val edges = SyntheticGraph.zipfEdges(spark, 20000L, avgDeg = 8, seed = 5L).cache()
    val tmp = Files.createTempDirectory("reorder").toFile
    try {
      val scrambled = edges
        .withColumn("h", xxhash64(col("src"), col("dst")))
        .repartition(4, col("h")).sortWithinPartitions(col("h"))
        .select(col("src"), col("dst"), col("w"))
      scrambled.write.mode("overwrite").parquet(s"$tmp/scrambled")
      Graphs.reorderEdgesForCompression(edges)
        .write.mode("overwrite").parquet(s"$tmp/sorted")

      val sScr = dirBytes(new java.io.File(s"$tmp/scrambled"))
      val sSort = dirBytes(new java.io.File(s"$tmp/sorted"))
      assert(sSort < (sScr * 0.8).toLong,
        s"sorted layout $sSort bytes should be <80% of scrambled $sScr bytes")

      // identical content either way (order is an encoding concern, not a semantic one)
      assert(contentSig(spark.read.parquet(s"$tmp/sorted")) ===
        contentSig(spark.read.parquet(s"$tmp/scrambled")))
    } finally {
      edges.unpersist()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("adjacency rows carry ascending neighborhoods with aligned weights") {
    val edges = undirected(Seq((1L, 5L, 2L), (1L, 3L, 7L), (1L, 9L, 1L), (3L, 5L, 4L)))
    val adj = Graphs.adjacency(edges).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))
      .toList.sortBy(_._1)
    val byNode = adj.map(t => t._1 -> t).toMap
    assert(byNode(1L)._2 === List(3L, 5L, 9L))
    assert(byNode(1L)._3 === List(7L, 2L, 1L)) // weights aligned with sorted neighbors
    assert(byNode(5L)._2 === List(1L, 3L))
    assert(byNode(5L)._3 === List(2L, 4L))
    adj.foreach { case (_, nbrs, ws) =>
      assert(nbrs === nbrs.sorted)
      assert(nbrs.size === ws.size)
    }
  }
}
