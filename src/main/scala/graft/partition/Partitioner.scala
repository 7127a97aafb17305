package graft.partition

import graft.model.{CsrGraph, PartCtx}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Ckpt

/** Balanced k-way graph partitioning — the engine's flagship operator, mirroring the
  * reference's library surface (`/root/reference/include/kaminpar-shm/kaminpar.h:912-1025`
  * `compute_partition`, SURVEY §3.2) as a Scala builder over a symmetric edge Dataset.
  *
  * Pipeline (deep-multilevel shape, `deep_multilevel.cc:55-67` / dist variant):
  *   1. distributed coarsening: LP clustering with weight caps + contraction until the
  *      graph fits the driver threshold (DistCoarsener);
  *   2. initial partitioning of the coarsest graph on the driver (SeqPartitioner) —
  *      the analog of dKaMinPar's replicate-everywhere + shm partitioner;
  *   3. uncoarsening: project the partition up level by level, refining with
  *      probabilistic LP (O24) + overload balancing (O17) at each level.
  *
  * Deterministic given the seed. Every level is checkpointed, so convergence is
  * resumable and lineage stays flat.
  */
final class Partitioner private (
    edges: DataFrame,
    nodeWeights: Option[DataFrame],
    k: Int,
    epsilon: Double,
    seed: Long,
    driverThreshold: Long,
    refineIters: Int
) {

  def setK(k: Int) = copy(k = k)
  def setEpsilon(e: Double) = copy(epsilon = e)
  def setSeed(s: Long) = copy(seed = s)
  def setDriverThreshold(t: Long) = copy(driverThreshold = t)
  def setRefineIters(i: Int) = copy(refineIters = i)
  def setNodeWeights(w: DataFrame) = copy(nodeWeights = Some(w))

  private def copy(
      edges: DataFrame = edges,
      nodeWeights: Option[DataFrame] = nodeWeights,
      k: Int = k,
      epsilon: Double = epsilon,
      seed: Long = seed,
      driverThreshold: Long = driverThreshold,
      refineIters: Int = refineIters
  ) = new Partitioner(edges, nodeWeights, k, epsilon, seed, driverThreshold, refineIters)

  /** @return (assignment (node, block), cut, blockWeights) */
  def computePartition(spark: SparkSession): Partitioner.Result = {
    val runId = "partition-" + seed + "-" + System.identityHashCode(this)
    val e = Ckpt(edges.select(col("src"), col("dst"), col("w")), "edges")
    val nodeW = Ckpt(
      nodeWeights.getOrElse(
        e.select(col("src").as("node")).distinct().withColumn("weight", lit(1L))
      ),
      "nodew")

    val stats = nodeW.agg(sum(col("weight")), max(col("weight")), count(lit(1))).first()
    val ctx = PartCtx(k, epsilon, stats.getLong(0), stats.getLong(1))
    val n = stats.getLong(2)

    // scale-aware driver handoff (round-2 fix): an explicit threshold wins; otherwise
    // clamp(n/4, 512, 100k) so any graph big enough to benefit runs >=1 distributed
    // coarsening level instead of being silently collected whole
    val targetN =
      if (driverThreshold > 0) driverThreshold
      else math.min(100000L, math.max(512L, n / 4))

    // 1. distributed coarsening (node target + edge cap: the driver collect below is
    // bounded by EDGES too, since coarsening densifies graphs)
    val (levels, cEdges, cNodeW) =
      DistCoarsener.coarsen(spark, e, nodeW, k, epsilon, targetN, seed,
        targetM = Partitioner.DriverEdgeCap)

    // 2. coarsest graph -> driver, dense-relabel sparse coarse ids, partition
    val coarseNodes = cNodeW.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val idOf = coarseNodes.iterator.map(_._1).zipWithIndex.toMap
    val vw = coarseNodes.map(_._2)
    val coarseEdgeArr = cEdges.collect().map { r =>
      (idOf(r.getLong(0)).toLong, idOf(r.getLong(1)).toLong, r.getLong(2))
    }
    val csr = CsrGraph.fromEdges(coarseNodes.length, coarseEdgeArr, vw)
    // the FINE graph's balance bounds drive the coarse-level partition; coarse-node
    // granularity slack is handled inside the sequential partitioner's relax()
    val seqRes = SeqPartitioner.partitionKwayBest(
      csr, k, epsilon, seed,
      boundsOverride = Some((ctx.perfectBlockWeight, ctx.maxBlockWeight))
    )

    import spark.implicits._
    var part = coarseNodes.indices
      .map(i => (coarseNodes(i)._1, seqRes.part(i)))
      .toDF("node", "block")

    // 3. uncoarsen: project up + refine per level (finest level last)
    var lastBlockW: Option[Array[Long]] = None
    var levelNo = levels.length - 1
    while (levelNo >= 0) {
      val level = levels(levelNo)
      val fineNodeW =
        if (levelNo == 0) nodeW
        else levels(levelNo - 1).coarseNodeW
      val fineEdges =
        if (levelNo == 0) e
        else levels(levelNo - 1).coarseEdges
      val projected = level.mapping
        .join(part.withColumnRenamed("node", "cnode"), "cnode")
        .select(col("node"), col("block"))
      // hash-partition this level's edges by the gather key ONCE; every refinement
      // stage below reuses the layout (only vertex state shuffles per superstep)
      val fe = fineEdges.select(col("src"), col("dst"), col("w"))
        .repartition(col("dst")).persist()
      val refined = DistRefiner.lpRefine(
        spark, fe, fineNodeW, projected, k, ctx.maxBlockWeight,
        maxIter = refineIters, seed = seed + levelNo, runId = runId, level = levelNo
      )
      val balanced = DistRefiner
        .balance(spark, fe, fineNodeW, refined, k, ctx.maxBlockWeight, seed = seed + levelNo)
      // JET pass (O20): negative-gain-tolerant bulk moves with an afterwards-filter —
      // recovers cut quality that positive-gain LP cannot reach from a projected
      // partition; keeps the best (feasible, cut) snapshot, so it never regresses
      val jet = DistRefiner.jetRefine(
        spark, fe, fineNodeW, balanced, k, ctx.maxBlockWeight,
        rounds = 4, seed = seed + 1000 + levelNo, runId = runId, level = levelNo
      )
      // positive-gain LP polish over JET's winner: strictly non-worsening (gain > 0
      // with per-target rollback), picks up the stragglers JET's bulk rounds leave
      val polishW = new Array[Long](k)
      val polished = DistRefiner.lpRefine(
        spark, fe, fineNodeW, jet.part, k, ctx.maxBlockWeight,
        maxIter = 3, seed = seed + 2000 + levelNo, runId = runId, level = levelNo,
        lastBlockW = Some(polishW)
      )
      part = polished
      lastBlockW = Some(polishW)
      fe.unpersist()
      levelNo -= 1
    }

    // the finest level's polish tracked its block weights exactly — reuse them; the
    // cut needs one final aggregation (exact, asserted self-consistent in tests)
    val (blockW, cut) = lastBlockW match {
      case Some(w) if levels.nonEmpty => (w, Metrics.edgeCut(e, part))
      case _ => (Metrics.blockWeights(part, nodeW, k), Metrics.edgeCut(e, part))
    }
    Partitioner.Result(part, cut, blockW, Metrics.imbalance(blockW), ctx,
      graft.util.IterMetricsCollector.drain(runId))
  }
}

object Partitioner {
  final case class Result(
      assignment: DataFrame,
      cut: Long,
      blockWeights: Array[Long],
      imbalance: Double,
      ctx: PartCtx,
      iterMetrics: Seq[graft.model.IterMetrics] = Seq.empty
  ) {
    def feasible: Boolean = blockWeights.forall(_ <= ctx.maxBlockWeight)
  }

  /** Max coarse edges collected to the driver: coarsening densifies, so the handoff
    * must be bounded by edges, not just nodes (a 100k-node coarse web graph can carry
    * 10^8+ edges). 2M edge triples ≈ 50 MB on the driver — comfortable.
    */
  val DriverEdgeCap = 2000000L

  /** Entry point: `Partitioner(edges).setK(16).setEpsilon(0.03).computePartition(spark)`.
    * `edges` must be a symmetric (src, dst, w) table (use Graphs.symmetrize).
    * Driver threshold <= 0 (default) = scale-aware: min(100k, max(512, n/4)).
    */
  def apply(edges: DataFrame): Partitioner =
    new Partitioner(edges, None, 2, 0.03, 42L, -1L, 5)
}
