package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Ckpt

/** Auxiliary distributed graph algorithms (SURVEY O29, reference
  * `kaminpar-dist/algorithms/`): border nodes, a random maximal independent set, and
  * greedy node coloring — the classic hash-priority BSP recasts of the reference's
  * `independent_set.cc` / `greedy_node_coloring.h` / `border_nodes.cc`.
  *
  * All deterministic given the seed (priorities are seeded hashes, never
  * partition-order); every superstep is one gather aggregation + one checkpoint.
  */
object Auxiliary {

  /** Border nodes of a partition: endpoints of cut edges (reference
    * `algorithms/border_nodes.cc` role). One join + distinct.
    */
  def borderNodes(edges: DataFrame, part: DataFrame): DataFrame =
    edges
      .join(part.select(col("node").as("src"), col("block").as("sb")), "src")
      .join(part.select(col("node").as("dst"), col("block").as("db")), "dst")
      .filter(col("sb") =!= col("db"))
      .select(col("src").as("node"))
      .distinct()

  /** Random maximal independent set, Luby-style (reference
    * `algorithms/independent_set.cc` role): per round, every undecided node whose
    * seeded hash beats all undecided neighbors joins the set; its neighbors drop out.
    * O(log n) rounds w.h.p.
    */
  def maximalIndependentSet(
      spark: SparkSession,
      edges: DataFrame,
      maxIter: Int = 40,
      seed: Long = 42L
  ): DataFrame = {
    val e = edges.select(col("src"), col("dst")).repartition(col("dst")).persist()
    // state: 0 = undecided, 1 = in set, -1 = excluded
    var state = Ckpt(
      e.select(col("src").as("node")).distinct().withColumn("s", lit(0)),
      "mis-state")
    var it = 0
    var undecided = 1L
    while (it < maxIter && undecided > 0) {
      // per-round priorities (seed + iteration): adjacent nodes with COLLIDING
      // hashes would otherwise never pass the strict '>' test and stall undecided
      // forever — a fresh draw each round resolves ties w.h.p.
      val pri = xxhash64(col("node"), lit(seed), lit(it))
      val und = state.filter(col("s") === 0).select(col("node"), pri.as("p"))
      // per undecided node: the max neighbor priority among undecided neighbors, and
      // whether any neighbor is already IN the set
      val nbr = e
        .join(state.select(col("node").as("dst"), col("s").as("ns")), "dst")
        .join(und.select(col("node").as("dst"), col("p").as("np")),
          Seq("dst"), "left")
        .groupBy(col("src"))
        .agg(
          max(when(col("ns") === 0, col("np"))).as("maxUndecidedNbr"),
          max(when(col("ns") === 1, 1).otherwise(0)).as("hasSetNbr")
        )
      val next = Ckpt(
        state
          .join(nbr.withColumnRenamed("src", "node"), Seq("node"), "left")
          .select(
            col("node"),
            when(col("s") =!= 0, col("s"))
              .when(coalesce(col("hasSetNbr"), lit(0)) === 1, lit(-1))
              .when(
                col("maxUndecidedNbr").isNull ||
                  xxhash64(col("node"), lit(seed), lit(it)) > col("maxUndecidedNbr"),
                lit(1))
              .otherwise(lit(0))
              .as("s")
          ),
        "mis-state")
      undecided = next.filter(col("s") === 0).count()
      state = next
      it += 1
    }
    e.unpersist()
    state.filter(col("s") === 1).select(col("node"))
  }

  /** Greedy node coloring (reference `algorithms/greedy_node_coloring.h` role):
    * hash-priority rounds — a node colors itself with the smallest color unused by
    * its already-colored neighbors once every higher-priority neighbor is colored.
    * Produces a proper coloring in O(max out-priority-chain) rounds.
    */
  def greedyColoring(
      spark: SparkSession,
      edges: DataFrame,
      maxIter: Int = 60,
      seed: Long = 42L
  ): DataFrame = {
    val e = edges.select(col("src"), col("dst")).repartition(col("dst")).persist()
    var colors = Ckpt(
      e.select(col("src").as("node")).distinct().withColumn("color", lit(-1)),
      "color-state")
    var it = 0
    var uncolored = 1L
    while (it < maxIter && uncolored > 0) {
      // per uncolored node: set of neighbor colors + whether a higher-priority
      // uncolored neighbor still exists. Priorities are per-round (seed + iteration)
      // so colliding adjacent hashes resolve next round instead of stalling at -1.
      val nbr = e
        .join(colors.select(col("node").as("dst"), col("color").as("nc")), "dst")
        .join(
          colors.filter(col("color") === -1)
            .select(col("node").as("dst"), xxhash64(col("dst"), lit(seed), lit(it)).as("np")),
          Seq("dst"), "left")
        .groupBy(col("src"))
        .agg(
          collect_set(when(col("nc") >= 0, col("nc"))).as("used"),
          max(col("np")).as("maxUncoloredNbr")
        )
      val next = Ckpt(
        colors
          .join(nbr.withColumnRenamed("src", "node"), Seq("node"), "left")
          .select(
            col("node"),
            when(col("color") >= 0, col("color"))
              .when(
                col("maxUncoloredNbr").isNull ||
                  xxhash64(col("node"), lit(seed), lit(it)) > col("maxUncoloredNbr"),
                // smallest non-negative integer not in `used`: used has <= deg
                // entries, so a value in [0, size(used)] is always free
                aggregate(
                  sequence(lit(0), size(coalesce(col("used"), array()))),
                  lit(-1),
                  (acc, c) =>
                    when(acc >= 0, acc)
                      .when(!array_contains(coalesce(col("used"), array()), c), c)
                      .otherwise(acc)
                )
              )
              .otherwise(lit(-1))
              .as("color")
          ),
        "color-state")
      uncolored = next.filter(col("color") === -1).count()
      colors = next
      it += 1
    }
    e.unpersist()
    colors
  }
}
