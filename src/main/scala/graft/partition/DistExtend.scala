package graft.partition

import graft.model.CsrGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deep-MGP k-extension during uncoarsening (SURVEY O15/O16 distributed, reference
  * `kaminpar-shm/partitioning/deep/deep_multilevel.cc:275-328`): the coarsest graph is
  * partitioned to only k' = 2^j blocks (enough that every block holds ~`CExt` coarse
  * nodes); as uncoarsening grows the graph, every level extends k' toward k by
  * bisecting each block's induced subgraph — extracted distributed, bisected on the
  * driver (the subgraphs are ~2*CExt nodes by construction, exactly the
  * reference's recipe of running initial partitioning only ever on small graphs), and
  * applied back as a bulk move table. This is the shape that makes k=30000 feasible:
  * no stage ever partitions more than a block-sized subgraph sequentially.
  *
  * Groups are tracked as (blockId = final-range start, fk = #final blocks owned),
  * reproduced functionally from the doubling count — resumable runs re-derive them.
  */
object DistExtend {

  /** Target block size during extension (the reference uses C = 2000 coarse nodes per
    * block, `partition_utils.cc:92-100`; smaller here because our driver bisections
    * are cheap and smaller blocks extend earlier = more distributed refinement at
    * intermediate k).
    */
  val CExt = 256L

  /** Groups after d breadth-first doublings of (0, k) — EXACTLY the halving tree
    * SeqPartitioner.extendAndRefine walks, so driver and distributed extensions agree.
    */
  def splitGroups(k: Int, d: Int): List[(Int, Int)] = {
    def go(lo: Int, fk: Int, depth: Int): List[(Int, Int)] =
      if (fk == 1 || depth == 0) List((lo, fk))
      else {
        val k0 = (fk + 1) / 2
        go(lo, k0, depth - 1) ++ go(lo + k0, fk - k0, depth - 1)
      }
    go(0, k, d)
  }

  /** k below which the coarsest graph is always partitioned straight to k on the
    * driver (extension is the LARGE-k scale path; for small k the driver IP at full k
    * measures better — Walshaw k=16 quality bar).
    */
  val MinExtendK = 32

  /** Doublings at a graph of n nodes: enough that blocks average >= ~CExt nodes,
    * capped at full k — min(ceil(log2 k), ceil(log2(n / CExt))). Small k goes
    * straight to full (no extension).
    */
  def doublingsFor(n: Long, k: Int): Int = {
    def ceilLog2(x: Long): Int = if (x <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1)
    if (k < MinExtendK) ceilLog2(k.toLong)
    else math.min(ceilLog2(k.toLong), math.max(1, ceilLog2(math.max(1L, n / CExt))))
  }

  /** One distributed doubling: every group with fk > 1 bisects its block-induced
    * subgraph (collected — bounded by the extension schedule to ~2*CExt nodes per
    * block) and side 1 moves to block lo+k0. Returns the updated partition (same
    * DataFrame lineage + a bulk move join).
    */
  def extendDoubling(
      spark: SparkSession,
      edges: DataFrame,
      nodeW: DataFrame,
      part: DataFrame,
      groups: List[(Int, Int)],
      perfect: Long,
      lmax: Long,
      seed: Long
  ): DataFrame = {
    val splitting = groups.filter(_._2 > 1)
    if (splitting.isEmpty) return part
    val los = splitting.map(_._1)

    val mem = part.join(nodeW, "node")
      .filter(col("block").isin(los.map(Int.box): _*))
      .select(col("node"), col("block"), col("weight"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue(), r.getLong(2)))
    val pSrc = part.select(col("node").as("src"), col("block").as("sb"))
    val pDst = part.select(col("node").as("dst"), col("block").as("db"))
    val ind = edges
      .join(pSrc, "src")
      .join(pDst, "dst")
      .filter(col("sb") === col("db") && col("sb").isin(los.map(Int.box): _*))
      .select(col("src"), col("dst"), col("w"), col("sb"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getAs[Number](3).intValue()))

    val memByBlock = mem.groupBy(_._2)
    val edgesByBlock = ind.groupBy(_._4)
    val moves = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    for ((lo, fk) <- splitting) {
      val members = memByBlock.getOrElse(lo, Array.empty).sortBy(_._1)
      if (members.nonEmpty) {
        val idOf = members.iterator.map(_._1).zipWithIndex.toMap
        val vw = members.map(_._3)
        val es = edgesByBlock.getOrElse(lo, Array.empty)
          .map(e => (idOf(e._1).toLong, idOf(e._2).toLong, e._3))
        val csr = CsrGraph.fromEdges(members.length, es, vw)
        val k0 = (fk + 1) / 2
        val k1 = fk - k0
        val total = csr.totalNodeWeight
        var t0 = math.ceil(total.toDouble * k0 / fk).toLong
        if (total - t0 > k1 * lmax) t0 = total - k1 * lmax
        if (t0 > k0 * lmax) t0 = k0 * lmax
        val side = SeqPartitioner.bisect(csr, t0, total - t0, k0 * lmax, k1 * lmax, seed + lo)
        var i = 0
        while (i < members.length) {
          if (side(i) == 1) moves += ((members(i)._1, lo + k0))
          i += 1
        }
      }
    }
    import spark.implicits._
    if (moves.isEmpty) part
    else
      part.join(broadcast(moves.toSeq.toDF("node", "nb2")), Seq("node"), "left")
        .select(col("node"), coalesce(col("nb2"), col("block")).cast("int").as("block"))
  }
}
