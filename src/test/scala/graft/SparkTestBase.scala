package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.model.Edge

/** Shared local SparkSession for tests (one per JVM; tests fork). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkFunSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.spark

  /** Symmetric edge DataFrame from an undirected edge list (u, v[, w]). */
  def undirected(edges: Seq[(Long, Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    val both = edges.flatMap { case (u, v, w) => Seq(Edge(u, v, w), Edge(v, u, w)) }
    spark.createDataset(both).toDF()
  }

  def undirectedUnit(edges: Seq[(Long, Long)]): DataFrame =
    undirected(edges.map { case (u, v) => (u, v, 1L) })

  /** In-test union-find oracle for connected components. */
  def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  /** In-test dense-array PageRank oracle (damping 0.85, dangling uniform). */
  def pageRankOracle(n: Int, edges: Seq[(Long, Long)], iters: Int, d: Double = 0.85): Array[Double] = {
    val out = Array.fill(n)(0)
    edges.foreach { case (u, _) => out(u.toInt) += 1 }
    var pr = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val next = Array.fill(n)((1.0 - d) / n)
      var dangling = 0.0
      (0 until n).foreach(i => if (out(i) == 0) dangling += pr(i))
      edges.foreach { case (u, v) => next(v.toInt) += d * pr(u.toInt) / out(u.toInt) }
      (0 until n).foreach(i => next(i) += d * dangling / n)
      pr = next
    }
    pr
  }
}
