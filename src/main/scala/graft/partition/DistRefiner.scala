package graft.partition

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{Ckpt, Log}

/** Distributed balanced refinement — the uncoarsening half of the partitioner.
  *
  * Model: the reference's *distributed* LP refiner with probabilistic move acceptance
  * and whole-round rollback (`/root/reference/kaminpar-dist/refinement/lp/
  * lp_refiner.cc:164-333`, SURVEY O24) — explicitly designed for bulk-synchronous
  * execution, which is exactly Spark's model:
  *
  *  1. per node: best positive-gain target block (gather + argmax, like coarsening);
  *  2. per target block: total expected gain G_b and residual capacity R_b (k-row
  *     table, collected to the driver like the reference's allreduce);
  *  3. accept each candidate move with probability
  *     p = (gain/G_b) * (R_b / w(u)) — in expectation the admitted weight fits R_b;
  *     the coin is a seeded hash (deterministic, partition-independent);
  *  4. aggregate the (from, to) move deltas (k^2 rows — the allreduce analog); any
  *     TARGET block that would over-cap rolls back all of its moves this round (a
  *     finer-grained version of the reference's whole-round rollback,
  *     `lp_refiner.cc:296-333`) — so the balance invariant holds exactly at every
  *     superstep end, the property our ScalaTest property checks assert.
  *
  * Plus an overload balancer (SURVEY O17 role) as a safety net: ranked-prefix
  * evictions from overloaded blocks by relative gain.
  */
object DistRefiner {

  /** One refinement run: maxIter probabilistic LP supersteps. `part` = (node, block),
    * `nodeW` = (node, weight). Returns updated part. Never increases cut (moves have
    * positive gain and rounds that break balance roll back).
    */
  def lpRefine(
      spark: SparkSession,
      edges: DataFrame,
      nodeW: DataFrame,
      part0: DataFrame,
      k: Int,
      lmax: Long,
      maxIter: Int = 5,
      seed: Long = 42L,
      runId: String = "",
      level: Int = -1
  ): DataFrame = {
    // PRECONDITION (co-partitioning contract): callers hash-partition `edges` by the
    // gather key (dst) once per level and pin it — see Partitioner/ScalingBench — so
    // supersteps reuse that layout and only the n-row state shuffles.
    val e = edges
    var part = Ckpt(
      part0.join(nodeW, "node").select(col("node"), col("block"), col("weight")),
      "ref-part")

    // Superstep shape (scales like the PageRank gather — no k-key windows, no
    // duplicated subplans, no per-round full-plan recomputation):
    //   job 1: gather + ONE combined aggregation (argmax external block AND internal
    //          weight in the same pass) + coin thinning -> checkpoint `accepted`;
    //   job 2: k^2-row (from, to) delta aggregate over the checkpointed accepted —
    //          the reference's allreduce; violating TARGET blocks roll back all their
    //          moves this round (per-block rollback, `lp_refiner.cc:296-333` made
    //          finer-grained);
    //   job 3: apply surviving moves -> checkpoint part.
    // Block weights are maintained driver-side from the deltas (k values), so the
    // balance invariant holds exactly at every superstep end.
    val blockW: Array[Long] =
      Metrics.blockWeights(part.select(col("node"), col("block")), nodeW, k)

    var it = 0
    while (it < maxIter) {
      import spark.implicits._
      val residualDf = broadcast(
        (0 until k).map(b => (b, math.max(0L, lmax - blockW(b)))).toDF("cand", "residual"))

      val parity = pmod(xxhash64(col("node"), lit(seed)) + lit(it), lit(2))
      val active = part.filter(parity === 0)

      // gather: per (active node, adjacent block) summed edge weight, then ONE
      // aggregation yielding both the internal weight and the best external block
      val ratings = e
        .join(part.select(col("node").as("dst"), col("block").as("nb")), "dst")
        .join(
          active.select(col("node").as("src"), col("block").as("cur"), col("weight").as("nw")),
          "src"
        )
        .groupBy(col("src"), col("cur"), col("nw"), col("nb"))
        .agg(sum(col("w")).as("rating"))

      val perNode = ratings
        .withColumn("tb", xxhash64(col("nb"), lit(seed)))
        .groupBy(col("src"), col("cur"), col("nw"))
        .agg(
          sum(when(col("nb") === col("cur"), col("rating")).otherwise(0L)).as("internalW"),
          max_by(
            struct(col("nb"), col("rating")),
            struct(
              when(col("nb") === col("cur"), lit(Long.MinValue)).otherwise(col("rating")).as("r"),
              (-col("tb")).as("h"), (-col("nb")).as("n")
            )
          ).as("bestS")
        )
        .select(
          col("src").as("node"), col("cur"), col("nw"),
          col("bestS.nb").as("cand"),
          (col("bestS.rating") - col("internalW")).as("gain")
        )
        .filter(col("cand") =!= col("cur") && col("gain") > 0)

      val candidates = perNode
        .join(residualDf, "cand")
        .filter(col("nw") <= col("residual"))

      // O24 probabilistic acceptance: p = (gain/G_b) * (R_b/w) — expected admitted
      // weight per target <= residual; G_b folded in as an agg+join, coin is a seeded
      // hash (deterministic, partition-independent)
      val gainDf = candidates.groupBy(col("cand")).agg(sum(col("gain")).as("G"))
      val accepted = Ckpt(
        candidates
          .join(gainDf, "cand")
          .withColumn(
            "p",
            (col("gain").cast("double") / col("G")) * (col("residual").cast("double") / col("nw"))
          )
          .withColumn(
            "coin",
            pmod(xxhash64(col("node"), lit(seed), lit(it)), lit(1000000000L)).cast("double") / 1e9
          )
          .filter(col("coin") < col("p"))
          .select(col("node"), col("cur"), col("cand"), col("nw")),
        "ref-accepted")

      // per-(from, to) weight deltas (<= k^2 rows) — the allreduce analog
      val deltas = accepted.groupBy(col("cur"), col("cand")).agg(sum(col("nw")).as("mw"))
        .collect()
        .map(r => (r.getAs[Number]("cur").intValue(), r.getAs[Number]("cand").intValue(), r.getAs[Long]("mw")))
      val inW = new Array[Long](k)
      deltas.foreach { case (_, to, mw) => inW(to) += mw }
      val okBlocks = (0 until k).filter(b => blockW(b) + inW(b) <= lmax).toSet
      val surviving =
        if (okBlocks.size == k) accepted
        else accepted.filter(col("cand").isin(okBlocks.toSeq.map(Int.box): _*))

      part = Ckpt(
        part
          .join(surviving.select(col("node"), col("cand")), Seq("node"), "left")
          .select(
            col("node"),
            coalesce(col("cand"), col("block")).cast("int").as("block"),
            col("weight")
          ),
        "ref-part")

      deltas.foreach { case (from, to, mw) =>
        if (okBlocks(to)) { blockW(from) -= mw; blockW(to) += mw }
      }
      Log.info(s"lpRefine iter $it: moves=${deltas.map(_._3).sum} rolledBackBlocks=${k - okBlocks.size}")
      if (runId.nonEmpty)
        graft.util.IterMetricsCollector.add(runId, level, it, deltas.map(_._3).sum)
      it += 1
    }
    part.select(col("node"), col("block"))
  }

  /** JET refiner (SURVEY O20, reference `refinement/jet/jet_refiner.cc` — a
    * bulk-synchronous refiner designed for GPUs, i.e. exactly Spark's model). Per
    * round:
    *   1. every node picks its best external block, keeping moves with gain
    *      > -c * internal (negative-gain tolerance c annealed toward 0 — the
    *      hill-climbing LP lacks);
    *   2. afterwards-filter: gains are recomputed UNDER the tentative assignment
    *      (neighbors that also plan to move count at their target blocks); only moves
    *      still non-negative survive — this kills oscillations;
    *   3. all surviving moves apply unconditionally, then the overload balancer
    *      restores feasibility — invoked ONLY when the move deltas show an overloaded
    *      block;
    *   4. the best snapshot by (feasible, cut) across rounds wins — lexicographic, so
    *      any feasible round beats an infeasible input partition.
    *
    * Scale shape (one-job-per-superstep rule, round-2 fix): exactly TWO full edge
    * passes per round — the phase-1 gather (checkpointed per-node table) and the
    * phase-2 recompute. The round's edge cut falls out of the phase-1 gather for free
    * (sum of external ratings / 2 over the checkpointed per-node table — no separate
    * edges-join-part aggregation), and block weights are maintained driver-side from
    * the k^2-row accepted-move deltas (the allreduce analog), never re-aggregated.
    */
  def jetRefine(
      spark: SparkSession,
      edges: DataFrame,
      nodeW: DataFrame,
      part0: DataFrame,
      k: Int,
      lmax: Long,
      rounds: Int = 6,
      seed: Long = 42L,
      runId: String = "",
      level: Int = -1
  ): DataFrame = {
    val e = edges // precondition: hash-partitioned by dst + pinned by the caller
    var part = Ckpt(
      part0.join(nodeW, "node").select(col("node"), col("block"), col("weight")),
      "jet-part")
    val blockW: Array[Long] =
      Metrics.blockWeights(part.select(col("node"), col("block")), nodeW, k)

    var best: DataFrame = null
    var bestCut = Long.MaxValue
    var bestFeasible = false
    def consider(snapshot: DataFrame, cut: Long, feasible: Boolean): Unit = {
      val better =
        if (feasible != bestFeasible) feasible
        else cut < bestCut
      if (best == null || better) { best = snapshot; bestCut = cut; bestFeasible = feasible }
    }

    var r = 0
    while (r < rounds) {
      val c = 0.75 * (rounds - 1 - r).toDouble / math.max(1, rounds - 1) // anneal to 0

      // phase 1: ONE gather pass -> per-node table with internal/external weight and
      // the best external block; checkpointed so the cut aggregate and the tentative
      // filter below both read the (n-row) parquet, not the full plan twice
      val ratings = e
        .join(part.select(col("node").as("dst"), col("block").as("nb")), "dst")
        .join(part.select(col("node").as("src"), col("block").as("cur"), col("weight").as("nw")), "src")
        .groupBy(col("src"), col("cur"), col("nw"), col("nb"))
        .agg(sum(col("w")).as("rating"))
      val perNode = Ckpt(
        ratings
          .withColumn("tb", xxhash64(col("nb"), lit(seed + r)))
          .groupBy(col("src"), col("cur"), col("nw"))
          .agg(
            sum(when(col("nb") === col("cur"), col("rating")).otherwise(0L)).as("internalW"),
            sum(when(col("nb") =!= col("cur"), col("rating")).otherwise(0L)).as("extW"),
            max_by(
              struct(col("nb"), col("rating")),
              struct(
                when(col("nb") === col("cur"), lit(Long.MinValue)).otherwise(col("rating")).as("rr"),
                (-col("tb")).as("h"), (-col("nb")).as("n")
              )
            ).as("bestS")
          )
          .select(
            col("src").as("node"), col("cur"), col("nw"),
            col("bestS.nb").as("cand"),
            (col("bestS.rating") - col("internalW")).as("gain"),
            col("internalW"), col("extW")
          ),
        "jet-pernode")

      // the cut of the partition ENTERING this round, free from the gather
      val cutNow = perNode.agg(coalesce(sum(col("extW")), lit(0L))).first().getLong(0) / 2
      val feasibleNow = Metrics.isBalanced(blockW, lmax)
      consider(part, cutNow, feasibleNow)
      Log.info(s"jet round $r: c=$c enteringCut=$cutNow feasible=$feasibleNow")
      if (runId.nonEmpty)
        graft.util.IterMetricsCollector.add(runId, level, r, -1L, cutNow, Metrics.imbalance(blockW))

      val tentative = perNode.filter(
        col("cand") =!= col("cur") &&
          col("gain").cast("double") > lit(-c) * col("internalW").cast("double")
      )

      // phase 2: afterwards-filter — neighbors that plan to move count at their
      // TENTATIVE blocks; keep only moves whose recomputed gain stays positive
      val tentLabels = part
        .join(tentative.select(col("node"), col("cand")), Seq("node"), "left")
        .select(col("node"), coalesce(col("cand"), col("block")).as("tblock"))
      val recomputed = e
        .join(tentLabels.select(col("node").as("dst"), col("tblock").as("tnb")), "dst")
        .join(tentative.select(col("node").as("src"), col("cur"), col("cand"), col("nw")), "src")
        .groupBy(col("src"), col("cur"), col("cand"), col("nw"))
        .agg(
          sum(when(col("tnb") === col("cand"), col("w")).otherwise(0L)).as("toCand"),
          sum(when(col("tnb") === col("cur"), col("w")).otherwise(0L)).as("toCur")
        )
      val accepted = Ckpt(
        recomputed
          .filter(col("toCand") - col("toCur") > 0)
          .select(col("src").as("node"), col("cur"), col("cand"), col("nw")),
        "jet-accepted")

      // phase 3: apply all surviving moves; block weights from the k^2-row deltas
      part = Ckpt(
        part
          .join(accepted.select(col("node"), col("cand")), Seq("node"), "left")
          .select(
            col("node"),
            coalesce(col("cand"), col("block")).cast("int").as("block"),
            col("weight")
          ),
        "jet-part")
      val deltas = accepted.groupBy(col("cur"), col("cand")).agg(sum(col("nw")).as("mw"))
        .collect()
        .map(row => (row.getAs[Number]("cur").intValue(), row.getAs[Number]("cand").intValue(), row.getAs[Long]("mw")))
      deltas.foreach { case (from, to, mw) => blockW(from) -= mw; blockW(to) += mw }

      // rebalance only when the deltas show an overloaded block
      if (!Metrics.isBalanced(blockW, lmax)) {
        val (balanced, balW) = balanceTracked(
          spark, e, nodeW, part.select(col("node"), col("block")), k, lmax,
          seed = seed + r, blockW0 = Some(blockW.clone()))
        part = Ckpt(
          balanced.join(nodeW, "node").select(col("node"), col("block"), col("weight")),
          "jet-part")
        System.arraycopy(balW, 0, blockW, 0, k)
      }
      r += 1
    }
    // the last round's result was never cut-evaluated inside the loop — one final pass
    val finalCut = Metrics.edgeCut(e, part.select(col("node"), col("block")))
    consider(part, finalCut, Metrics.isBalanced(blockW, lmax))
    Log.info(s"jet done: bestCut=$bestCut feasible=$bestFeasible")
    best.select(col("node"), col("block"))
  }

  /** Overload balancer (SURVEY O17 role): for each overloaded block, evict a
    * (relative-gain desc)-ranked prefix of members — just enough running weight to
    * cover the overload — into their best non-overloaded fitting block. A few
    * supersteps; terminates feasible whenever capacity exists.
    */
  def balance(
      spark: SparkSession,
      edges: DataFrame,
      nodeW: DataFrame,
      part0: DataFrame,
      k: Int,
      lmax: Long,
      maxRounds: Int = 8,
      seed: Long = 42L
  ): DataFrame =
    balanceTracked(spark, edges, nodeW, part0, k, lmax, maxRounds, seed, None)._1

  /** [[balance]] with driver-tracked block weights: pass the current weights in
    * (skipping the initial n-row aggregation) and get the final weights back; per
    * round the weights update from the admitted-move deltas (k^2 rows, read from the
    * already-checkpointed admitted table) instead of a full re-aggregation.
    */
  def balanceTracked(
      spark: SparkSession,
      edges: DataFrame,
      nodeW: DataFrame,
      part0: DataFrame,
      k: Int,
      lmax: Long,
      maxRounds: Int = 8,
      seed: Long = 42L,
      blockW0: Option[Array[Long]] = None
  ): (DataFrame, Array[Long]) = {
    var part = Ckpt(
      part0.join(nodeW, "node").select(col("node"), col("block"), col("weight")),
      "bal-part")
    val blockW = blockW0.getOrElse(
      Metrics.blockWeights(part.select(col("node"), col("block")), nodeW, k))
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val overloaded = (0 until k).filter(b => blockW(b) > lmax)
      if (overloaded.isEmpty) done = true
      else {
        val overSet = overloaded.toSet
        val residual = (0 until k).map(b => b -> math.max(0L, lmax - blockW(b))).toMap
        import spark.implicits._
        val residualDf = residual.toSeq.toDF("nb", "residual")
        val overloadDf = overloaded.map(b => b -> (blockW(b) - lmax)).toDF("cur", "overload")

        val members = part.filter(col("block").isin(overloaded.map(Int.box): _*))
          .select(col("node").as("src"), col("block").as("cur"), col("weight").as("nw"))

        // rating of each member toward every other block (0-degree members fall back
        // to a hash-chosen target)
        val ratings = edges
          .join(part.select(col("node").as("dst"), col("block").as("nb")), "dst")
          .join(members, "src")
          .groupBy(col("src"), col("cur"), col("nw"), col("nb"))
          .agg(sum(col("w")).as("rating"))
        val internal = ratings.filter(col("nb") === col("cur"))
          .select(col("src"), col("rating").as("internalW"))
        val best = ratings
          .filter(col("nb") =!= col("cur") && !col("nb").isin(overSet.toSeq.map(Int.box): _*))
          .join(residualDf, "nb")
          .filter(col("nw") <= col("residual"))
          .join(internal, Seq("src"), "left")
          .withColumn("gain", col("rating") - coalesce(col("internalW"), lit(0L)))
          .groupBy(col("src"), col("cur"), col("nw"))
          .agg(
            max_by(
              struct(col("nb"), col("gain")),
              struct(col("gain"), (-xxhash64(col("nb"), lit(seed))).as("h"))
            ).as("bestS")
          )
          .select(
            col("src"), col("cur"), col("nw"),
            col("bestS.nb").as("cand"), col("bestS.gain").as("gain")
          )

        // fallback: members with NO edge into any non-overloaded block (deeply interior
        // nodes of an overloaded region) target the emptiest block — the reference's
        // "random fallback" (`overload_balancer.cc:51-160` role); ranked last by a
        // strongly negative gain so adjacent candidates are always preferred.
        val fallbackTarget = residual.filter(_._2 > 0).toSeq.sortBy(-_._2).headOption.map(_._1)
        val withFallback = fallbackTarget match {
          case None => best
          case Some(fb) =>
            val noCand = members.join(best.select(col("src")), Seq("src"), "left_anti")
              .withColumn("cand", lit(fb))
              .withColumn("gain", lit(Long.MinValue / 4))
              .select(col("src"), col("cur"), col("nw"), col("cand"), col("gain"))
            best.unionAll(noCand)
        }

        // relative gain ordering (gain scaled by weight — reference relative_gain.h
        // role), prefix just covering the overload
        val wnd = Window.partitionBy(col("cur"))
          .orderBy(desc("relGain"), asc("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val evictions = withFallback
          .withColumn("relGain", col("gain").cast("double") / col("nw"))
          .withColumn("h", xxhash64(col("src"), lit(seed + round)))
          .join(overloadDf, "cur")
          .withColumn("runW", sum(col("nw")).over(wnd))
          .filter(col("runW") - col("nw") < col("overload"))
          .select(col("src").as("node"), col("cur"), col("cand"), col("nw"))

        // cap check per target: admit ranked prefix within residual
        val wnd2 = Window.partitionBy(col("cand"))
          .orderBy(asc("h2"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val admitted = Ckpt(
          evictions
            .withColumn("h2", xxhash64(col("node"), lit(seed + round)))
            .join(residualDf.select(col("nb").as("cand"), col("residual")), "cand")
            .withColumn("runW2", sum(col("nw")).over(wnd2))
            .filter(col("runW2") <= col("residual"))
            .select(col("node"), col("cur"), col("cand"), col("nw")),
          "bal-admitted")

        // k^2-row deltas from the checkpointed admitted table: updates the tracked
        // block weights AND doubles as the convergence count (no separate count job)
        val deltas = admitted.groupBy(col("cur"), col("cand")).agg(sum(col("nw")).as("mw"))
          .collect()
          .map(r => (r.getAs[Number]("cur").intValue(), r.getAs[Number]("cand").intValue(), r.getAs[Long]("mw")))
        Log.info(s"balance round $round: moveGroups=${deltas.length} over=${overloaded.size}")
        if (deltas.isEmpty) done = true // no capacity anywhere: stop (infeasible input)
        else {
          deltas.foreach { case (from, to, mw) => blockW(from) -= mw; blockW(to) += mw }
          part = Ckpt(
            part
              .join(admitted.select(col("node"), col("cand")), Seq("node"), "left")
              .select(
                col("node"),
                coalesce(col("cand"), col("block")).cast("int").as("block"),
                col("weight")
              ),
            "bal-part")
        }
      }
      round += 1
    }
    (part.select(col("node"), col("block")), blockW)
  }
}
