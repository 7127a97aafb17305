package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph construction over the harness parquet tables + generic edge-table hygiene.
  *
  * The canonical graph representation is a symmetric edge DataFrame
  * `(src BIGINT, dst BIGINT, w BIGINT)` storing BOTH directions of every undirected
  * edge with equal weight and no self-loops — the invariants the reference validates in
  * `/root/reference/kaminpar-shm/datastructures/csr_graph.h:486-496`. All downstream
  * operators (PageRank, CC, LP, the partitioner) consume this shape.
  *
  * Scale notes: every builder here is a single shuffle hash-aggregation; at 100 TB the
  * edge table would be bucketed by `src` on storage so the per-superstep
  * `edges JOIN state ON src = node` is a co-partitioned join with no re-shuffle of the
  * (much larger) edge side.
  */
object Graphs {

  /** Offset separating part-node ids from order-node ids in the bipartite graph so the
    * two key spaces never collide (both are dense small ints in the generator).
    * SQL-expressible so DuckDB oracles can reproduce it exactly.
    */
  val PartOffset = 100000000L

  private def pq(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Bipartite order--part link graph from `lineitem`: an undirected edge between
    * order node `l_orderkey` and part node `l_partkey + PartOffset`, weight = number of
    * lineitems connecting them. Returned symmetric (both directions).
    *
    * This is the engine's stand-in for the url->url web link graph: same shape
    * (two id spaces dictionary-encoded into one Long domain, heavy-tailed part
    * degrees play the hub-page role).
    */
  def bipartite(spark: SparkSession, sfDir: String): DataFrame = {
    // Fused one-shuffle build (optimization r06, guide §2.4): the per-(a,b) count
    // and the symmetrize canonical (lo,hi) sum are the SAME grouping (sum of group
    // counts = total count per unordered pair), so the intermediate groupBy(a,b) was
    // a second full shuffle for nothing. Result identical to
    // symmetrize(li.groupBy(a,b).count) — asserted by the unchanged q01 oracle.
    val li = pq(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("a"), (col("l_partkey") + PartOffset).as("b"))
    symmetrizeUnit(li)
  }

  /** Co-purchase graph over parts: an undirected edge between two parts that appear in
    * the same order, weight = number of shared orders. Contains triangles (unlike the
    * bipartite graph), so it is the triangle-counting / clustering-quality testbed.
    * Self-join bounded by orders' small lineitem counts (<= ~7), so the fan-out per
    * order is tiny; at web scale the same build would pre-filter giant "orders" (hub
    * containers) the way we drop high-degree shingles in MinHash-LSH.
    */
  def copurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val li = pq(spark, sfDir, "lineitem").select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val a = li.as("a")
    val b = li.as("b")
    // same one-shuffle fusion as bipartite: pairs are already canonical (lo < hi),
    // so the pre-aggregation + symmetrize re-aggregation collapse into one groupBy
    val pairs = a
      .join(b, col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("lo"), col("b.pk").as("hi"))
    symmetrizeUnit(pairs.select(col("lo").as("a"), col("hi").as("b")))
  }

  /** Symmetrize + dedup a directed edge list: drop self-loops, aggregate duplicate
    * (src,dst) pairs (summing weights over both input directions), and emit both
    * directions with equal weight — matching the reference's "reverse edges must carry
    * equal weight" contract (`kaminpar.h:904-910`).
    * One shuffle: canonicalize to (min,max) then hash-agg, then explode 2x map-side.
    */
  def symmetrize(edges: DataFrame): DataFrame = {
    val canon = edges
      .filter(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"),
        col("w")
      )
      .groupBy(col("lo"), col("hi"))
      .agg(sum(col("w")).as("w"))
    // both directions via a map-side explode — a UNION of two projections would scan
    // and aggregate the whole input twice (plan-audit finding)
    canon
      .select(explode(array(
        struct(col("lo").as("src"), col("hi").as("dst"), col("w")),
        struct(col("hi").as("src"), col("lo").as("dst"), col("w"))
      )).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
  }

  /** [[symmetrize]] for UNIT-weight directed pair streams (w = 1 per row): one
    * canonical hash-aggregation counts multiplicities directly, where
    * symmetrize-after-preaggregation would shuffle the stream twice for the same
    * groups. Semantics: symmetrize(pairs.groupBy(a,b).count) — the sum of
    * per-(a,b) counts over an unordered pair IS the pair's total multiplicity.
    */
  def symmetrizeUnit(pairs: DataFrame): DataFrame = {
    val canon = pairs
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).cast("long").as("w"))
    canon
      .select(explode(array(
        struct(col("lo").as("src"), col("hi").as("dst"), col("w")),
        struct(col("hi").as("src"), col("lo").as("dst"), col("w"))
      )).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
  }

  /** Weighted + unweighted degree per node. On the symmetric edge table this is a
    * single map-side-combinable hash aggregation — no join.
    */
  def degrees(edges: DataFrame): DataFrame =
    edges
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("degree"), sum(col("w")).as("wdegree"))

  /** Vertex table with unit weights: distinct node ids of the symmetric edge table. */
  def vertices(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node")).distinct().withColumn("weight", lit(1L))

  /** Exponentially-spaced degree buckets, the reference's main skew-management device
    * (`kaminpar-common/degree_buckets.h`, `permutator.cc:68`): bucket = floor(log2(deg))+1,
    * 0 for isolated nodes. Computed as length(bin(deg)) — exact integer bit-length, no
    * float-log boundary issues at powers of two. Used for hub splitting + AQE skew hints.
    */
  def degreeBuckets(edges: DataFrame): DataFrame =
    degrees(edges).withColumn(
      "bucket",
      when(col("degree") === 0L, 0L)
        .otherwise(length(bin(col("degree"))).cast("long"))
    )

  /** Edge reorder for compression (SURVEY P3, reference `permutator.cc:215`
    * `reorder_edges_by_compression`): the reference sorts each node's neighborhood
    * ascending so its gap+varint encoding stores small deltas. The at-rest Spark
    * analog: cluster the edge table by `src` and sort `(src, dst)` ascending inside
    * each file, so parquet's delta encodings see a constant run for `src` and small
    * positive gaps for `dst`. Same rows, same schema, strictly better encoding —
    * ReorderSpec measures the shrink on a Zipf web graph. At 100 TB this is the
    * difference between scanning X and scanning ~0.5X every superstep, and it
    * composes with bucketing (bucket by src, sort in-bucket).
    */
  def reorderEdgesForCompression(edges: DataFrame): DataFrame =
    edges.repartition(col("src")).sortWithinPartitions(col("src"), col("dst"))

  /** Adjacency-list form of the symmetric edge table: one row per node with its
    * neighborhood ascending (`sort_array` — P3's in-row equivalent) and parallel
    * weights array. The CSR-shaped at-rest layout for workloads that read whole
    * neighborhoods (BFS frontiers, per-node sampling); one shuffle hash-agg.
    */
  def adjacency(edges: DataFrame): DataFrame =
    edges
      .groupBy(col("src").as("node"))
      .agg(
        sort_array(collect_list(struct(col("dst"), col("w")))).as("s"))
      .select(
        col("node"),
        col("s.dst").as("neighbors"),
        col("s.w").as("weights"))

  /** Structural validation queries (reference `csr_graph.h:486-496` /
    * `graphutils/graph_validator.h`): returns per-check violation counts; all zero on a
    * valid graph. Cheap enough to run in tests and as a data-quality gate in prod.
    */
  def validate(edges: DataFrame): Map[String, Long] = {
    val selfLoops = edges.filter(col("src") === col("dst")).count()
    val nonPositive = edges.filter(col("w") <= 0L).count()
    val flipped = edges.select(col("dst").as("src"), col("src").as("dst"), col("w"))
    val asymmetric = edges.unionAll(flipped)
      .groupBy("src", "dst", "w").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2L)
      .count()
    Map("selfLoops" -> selfLoops, "nonPositiveWeight" -> nonPositive, "asymmetric" -> asymmetric)
  }
}
