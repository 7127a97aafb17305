package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Ckpt

/** Connected components via alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the north-star-mandated
  * algorithm. Converges in O(log n) supersteps (vs O(diameter) for naive min-label
  * flooding), which is the property that matters on web graphs whose diameter is large.
  *
  * Each phase is one shuffle: group the current edge set by node, compute the min of
  * the neighborhood, re-emit star edges. The edge set only shrinks toward the final
  * star forest, so per-superstep cost decreases. Deterministic: pure min/grouping, no
  * randomness. Fixpoint detection compares (count, xor-of-hashes) between rounds — two
  * scalar aggregates, no expensive except().
  *
  * The reference ships a sequential CC tool (`/root/reference/apps/tools/
  * ConnectedComponentsTool.cc`) as a companion utility; this operator supersedes it
  * (SURVEY.md P6).
  */
object ConnectedComponents {

  /** @param edges symmetric edge table (src, dst, w) — weights ignored.
    * @return (node BIGINT, component BIGINT) where component = min node id of the
    *         connected component (exact labels at convergence).
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // Per-round state staging is a LAZY localCheckpoint materialized by the fixpoint-
    // signature aggregate (count, xor-of-pair-hashes — order-independent, overflow-
    // free under ANSI mode): still ONE job per round, but no parquet round-trip
    // (optimization r06, the lpRefine staging pattern — the plan truncation is what
    // matters, and the lazy local checkpoint provides it without a storage write).
    // LogicalRDD keeps origin stats (see Ckpt's docstring), so the state is reset to
    // a parquet checkpoint every `statsResetEvery` rounds on LONG runs; typical runs
    // (O(log n) rounds) never pay a mid-loop write. Blocks are released after the
    // final parquet checkpoint below.
    val statsResetEvery = 8
    // superseded rounds' staged blocks, released eagerly one round later (round
    // t's blocks are dead as soon as round t+1's staging aggregate has run —
    // the same staleBlocks discipline as DistCoarsener.lpCluster); a slow
    // convergence must not pin O(rounds) copies of the pair table
    var stale: Seq[DataFrame] = Nil
    def stageWithSig(df: DataFrame): (DataFrame, (Long, Long)) = {
      val staged = df.localCheckpoint(false)
      val r = staged.agg(
        count(lit(1)).as("c"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).first()
      (staged, (r.getLong(0), r.getLong(1)))
    }

    // undirected edges as canonical pairs u > v (self-loops impossible downstream)
    var (pairs, sig) = stageWithSig(
      edges
        .filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("u"), least(col("src"), col("dst")).as("v"))
        .distinct())

    // consumed exactly once (final labeling join) — no persist needed
    val allNodes = edges.select(col("src").as("node")).distinct()
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // large-star: per node u over full neighborhood Γ(u) (both directions),
      // m = min(Γ(u) ∪ {u}); connect every strictly larger neighbor to m.
      // Exchange discipline (r06, guide §2.4): each phase's stream is hash-
      // partitioned by `u` exactly ONCE — the min aggregation, the min-join and the
      // dedup (distinct = groupBy(u, v), for which HashPartitioning(u) suffices)
      // all reuse that one layout, where the unpartitioned stream re-exchanged for
      // each of them (6 m-row exchanges per round, now 3).
      val sym = pairs
        .select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v"))
        )).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .repartition(col("u"))
      val mins = sym.groupBy(col("u")).agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = sym
        .join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .repartition(col("u"))
        .distinct()

      // small-star: orient larger -> smaller (already canonical in `large`),
      // per node u with smaller neighbors Γ<(u): m = min; connect u and all of Γ< to m.
      // `large` is already partitioned by u, so the aggregation and join are
      // exchange-free.
      val minsS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = large
        .join(minsS, "u")
        .select(col("v").as("a"), col("m"), col("u").as("uu"))
      val (rewired, newSig) = stageWithSig(
        small
          .select(explode(array(col("a"), col("uu"))).as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
          .repartition(col("u"))
          .distinct())

      // the previous round's staged blocks are dead — the only jobs that read
      // them (this round's staging aggregate) have run
      stale.foreach(graft.util.Par.releaseLocalCkpt)
      stale = Seq(pairs)
      converged = newSig == sig
      sig = newSig
      pairs = rewired
      it += 1
      if (it % statsResetEvery == 0 && !converged) {
        val ck = Ckpt(pairs, "cc-pairs") // the write reads the staged blocks
        stale = stale :+ pairs
        pairs = ck
      }
    }

    // final star forest parquet-checkpointed once (flat scan + fresh leaf stats for
    // the caller, exactly as before), after which the remaining staging blocks are
    // released (releaseLocalCkpt is a no-op on parquet-backed frames)
    val finalPairs = Ckpt(pairs.select(col("u"), col("v")), "cc-pairs-out")
    (stale :+ pairs).foreach(graft.util.Par.releaseLocalCkpt)
    allNodes
      .join(finalPairs.select(col("u").as("node"), col("v").as("root")), Seq("node"), "left")
      .select(col("node"), coalesce(col("root"), col("node")).as("component"))
  }
}
