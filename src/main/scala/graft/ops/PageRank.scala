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
      checkpointEvery: Int = 8
  ): DataFrame = {
    // Co-partitioning contract: the (big) edge table is hash-partitioned by src ONCE
    // and pinned; every superstep's gather join then reuses that partitioning, so only
    // the n-row state table moves through the shuffle — the edge table never
    // re-shuffles (the north-star "CSR-partitioned adjacency" in DataFrame terms; on a
    // real cluster this is the bucketed-by-src Iceberg layout).
    // sortWithinPartitions(src): the cached table carries its output ordering, so
    // every superstep's sort-merge gather join skips re-sorting the m-row edge side
    // (r06; the at-rest analog is a bucketed+sorted-by-src Iceberg layout) — only
    // the n-row rank state is sorted per superstep.
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).sortWithinPartitions(col("src")).persist()
    // static per-node base: node list with out-degree in ONE hash aggregation (each
    // edge emits (src, 1) and (dst, 0); sum of flags = out-degree, and every node of
    // either endpoint role appears) — replaces the distinct + groupBy + join shape,
    // which shuffled the edge stream twice and joined (guide §2.3/§2.4). Out-degree
    // rides in the iterated state, saving a join per superstep.
    val base = e
      .select(explode(array(
        struct(col("src").as("node"), lit(1L).as("c")),
        struct(col("dst").as("node"), lit(0L).as("c"))
      )).as("p"))
      .groupBy(col("p.node").as("node"))
      .agg(sum(col("p.c")).as("outdeg"))
      .persist()
    // n and the dangling-node check in ONE driver action (was: count + filter-count)
    val s0 = base.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(col("outdeg") === 0L, 1L).otherwise(0L)), lit(0L)).as("dangling")).first()
    val n = s0.getLong(0).toDouble
    // Dangling mass (nodes with no out-edges) is redistributed uniformly. On symmetric
    // link graphs there are none; detect that once so the common case pays no extra
    // per-iteration driver action.
    val hasDangling = s0.getLong(1) > 0L

    var state = base.withColumn("pr", lit(1.0 / n)) // (node, outdeg, pr)
    var it = 0
    while (it < iterations) {
      val dangling =
        if (!hasDangling) 0.0
        else state.filter(col("outdeg") === 0L)
          .agg(coalesce(sum(col("pr")), lit(0.0))).first().getDouble(0)
      val contribs = state
        .filter(col("outdeg") > 0L)
        .join(e, col("node") === col("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("contrib"))
      state = base
        .join(contribs, col("node") === col("dst"), "left")
        .select(
          col("node"), col("outdeg"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + lit(dangling / n)))
            .as("pr")
        )
      it += 1
      if (it % checkpointEvery == 0 && it < iterations) {
        state = Ckpt(state, "pr-ranks").repartition(col("node"))
      }
    }
    val out = state.select(col("node"), col("pr"))
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
