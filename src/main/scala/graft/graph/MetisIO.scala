package graft.graph

import graft.model.CsrGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** METIS text graph reader (reference S1, semantics per
  * `/root/reference/kaminpar-io/metis_parser.cc:36-146`): header `n m [fmt]` where fmt
  * is a decimal bitfield (1 = edge weights, 10 = node weights, 100 = vertex sizes —
  * sizes unsupported, as in the reference); `%` comment lines; adjacency lines are
  * 1-indexed and list BOTH directions of every undirected edge.
  *
  * Driver-side parse: METIS files are test fixtures (Walshaw instances, rgg2d) —
  * production ingest is the page table -> link extraction path. Returns either a
  * driver CsrGraph or a distributed symmetric edge DataFrame.
  */
object MetisIO {

  def readCsr(lines: Iterator[String]): CsrGraph = {
    val content = lines.filterNot(l => l.startsWith("%")).buffered
    val header = content.next().trim.split("\\s+")
    val n = header(0).toInt
    val m = header(1).toInt
    val fmt = if (header.length > 2) header(2).toInt else 0
    val hasVW = (fmt / 10) % 10 == 1
    val hasEW = fmt % 10 == 1
    val xadj = new Array[Int](n + 1)
    val adj = new mutable.ArrayBuilder.ofInt
    val ew = mutable.ArrayBuilder.make[Long]
    val vw = new Array[Long](n)
    adj.sizeHint(2 * m)
    var u = 0
    while (u < n) {
      val line = if (content.hasNext) content.next().trim else ""
      val toks = if (line.isEmpty) Array.empty[String] else line.split("\\s+")
      var i = 0
      if (hasVW) { vw(u) = toks(0).toLong; i = 1 } else vw(u) = 1L
      var deg = 0
      while (i < toks.length) {
        adj += toks(i).toInt - 1 // 1-indexed
        if (hasEW) { ew += toks(i + 1).toLong; i += 2 } else { ew += 1L; i += 1 }
        deg += 1
      }
      xadj(u + 1) = xadj(u) + deg
      u += 1
    }
    val adjArr = adj.result()
    require(adjArr.length == 2 * m, s"METIS: expected ${2 * m} directed edges, got ${adjArr.length}")
    new CsrGraph(xadj, adjArr, ew.result(), vw)
  }

  def readCsrResource(name: String): CsrGraph = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"resource $name not found")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try readCsr(src.getLines()) finally src.close()
  }

  def readCsrFile(path: String): CsrGraph = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try readCsr(src.getLines()) finally src.close()
  }

  /** Distributed form: symmetric edge DataFrame (src, dst, w). */
  def readEdges(spark: SparkSession, csr: CsrGraph): DataFrame = {
    import spark.implicits._
    val rows = (0 until csr.n).iterator.flatMap { u =>
      csr.neighbors(u).iterator.map(i => (u.toLong, csr.adjncy(i).toLong, csr.adjwgt(i)))
    }.toSeq
    spark.createDataset(rows).toDF("src", "dst", "w")
  }
}
