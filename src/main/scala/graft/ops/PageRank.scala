package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{Ckpt, RunCheckpoint}

/** PageRank as an iterative batch of shuffle-hash-join gather-scatter supersteps
  * (north-star companion operator; standard public semantics — damping 0.85, dangling
  * mass redistributed uniformly; see FIXTURES.md §5).
  *
  * One superstep = `ranks JOIN edges ON node = src` (contribution scatter) then
  * `GROUP BY dst` (gather sum). At cluster scale the edge table is bucketed/partitioned
  * by `src`, so the big side never re-shuffles: the per-iteration cost is one shuffle of
  * the (n-row) rank table plus one map-side-combined aggregation of contributions.
  * Lineage is truncated every `checkpointEvery` supersteps (localCheckpoint here;
  * Iceberg snapshots with per-iteration metrics rows in prod) so the plan does not grow
  * with iteration count — which is also what makes a run resumable from the last
  * checkpoint.
  */
object PageRank {

  /** @param edges symmetric or directed edge table (src, dst, w) — contributions are
    *              uniform over out-edges (unweighted PageRank).
    * @return (node BIGINT, pr DOUBLE); sum(pr) == 1 up to float error.
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      iterations: Int,
      damping: Double = 0.85,
      checkpointEvery: Int = 4
  ): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    // every node that appears as src or dst participates (one pass via explode)
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct()
      .persist()
    val n = nodes.count().toDouble
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("outdeg"))
      .persist()

    // Dangling mass (nodes with no out-edges) is redistributed uniformly. On symmetric
    // link graphs there are none; detect that once so the common case pays no extra
    // per-iteration driver action.
    val hasDangling = nodes.join(outDeg, Seq("node"), "left_anti").limit(1).count() > 0

    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    var it = 0
    while (it < iterations) {
      val withDeg = ranks.join(outDeg, Seq("node"), "left")
      val dangling =
        if (!hasDangling) 0.0
        else withDeg.filter(col("outdeg").isNull)
          .agg(coalesce(sum(col("pr")), lit(0.0))).first().getDouble(0)
      val contribs = withDeg
        .filter(col("outdeg").isNotNull)
        .join(e, col("node") === col("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("contrib"))
      ranks = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .select(
          col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + lit(dangling / n)))
            .as("pr")
        )
      it += 1
      if (it % checkpointEvery == 0 && it < iterations) {
        ranks = Ckpt(ranks, "pr-ranks")
      }
    }
    val out = ranks
    e.unpersist(); // nodes/outDeg stay pinned until the result is consumed by caller
    out
  }

  /** Resumable variant: every superstep's ranks are durably checkpointed with a
    * metrics row (superstep, l1 delta, wall ms); a restarted run continues from the
    * latest committed superstep instead of recomputing (north rule: resumable
    * convergence with per-partition lineage + per-iteration metrics). Identical math
    * to [[run]] — a fresh N-iteration run and an interrupted-then-resumed one produce
    * the same ranks.
    */
  def runResumable(
      spark: SparkSession,
      edges: DataFrame,
      iterations: Int,
      run: RunCheckpoint,
      damping: Double = 0.85
  ): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().persist()
    val n = nodes.count().toDouble
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("outdeg")).persist()
    val hasDangling = nodes.join(outDeg, Seq("node"), "left_anti").limit(1).count() > 0

    val startStep = run.latestStep // superstep indices are 1-based in the metrics
    var ranks = startStep match {
      case Some(s) => run.load(spark, s)
      case None => nodes.withColumn("pr", lit(1.0 / n))
    }
    var it = startStep.getOrElse(0)
    while (it < iterations) {
      val t0 = System.nanoTime()
      val withDeg = ranks.join(outDeg, Seq("node"), "left")
      val dangling =
        if (!hasDangling) 0.0
        else withDeg.filter(col("outdeg").isNull)
          .agg(coalesce(sum(col("pr")), lit(0.0))).first().getDouble(0)
      val contribs = withDeg
        .filter(col("outdeg").isNotNull)
        .join(e, col("node") === col("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("contrib"))
      val next = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .select(
          col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + lit(dangling / n)))
            .as("pr")
        )
      val prev = ranks
      val saved = run.save(it + 1, next) // durable write first; delta read is cheap after
      val l1 = saved.join(prev.withColumnRenamed("pr", "prevPr"), "node")
        .agg(sum(abs(col("pr") - col("prevPr")))).first().getDouble(0)
      val wallMs = (System.nanoTime() - t0) / 1000000
      run.appendMetrics(it + 1, Map("l1_delta" -> l1, "wall_ms" -> wallMs, "n" -> n.toLong))
      ranks = saved
      it += 1
    }
    run.markDone()
    e.unpersist()
    ranks
  }
}
