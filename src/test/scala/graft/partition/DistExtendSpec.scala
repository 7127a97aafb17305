package graft.partition

import graft.SparkFunSuite
import graft.graph.SyntheticGraph
import org.apache.spark.sql.functions._

/** Deep-MGP extend-k'->k (SURVEY O15/O16 distributed, round-2 judge item #10): large
  * k partitions the coarsest graph only to k' = 2^d and extends toward k during
  * uncoarsening via block-induced driver bisections. Must be feasible and within 1.2x
  * of the straight-to-k driver cut.
  */
class DistExtendSpec extends SparkFunSuite {

  test("splitGroups halving tree: sizes, coverage, determinism") {
    assert(DistExtend.splitGroups(64, 0) === List((0, 64)))
    assert(DistExtend.splitGroups(64, 2).map(_._2) === List(16, 16, 16, 16))
    val full = DistExtend.splitGroups(64, 6)
    assert(full.size === 64 && full.forall(_._2 == 1))
    assert(full.map(_._1).sorted === (0 until 64).toList)
    // non-power-of-two k: groups cover 0..k-1 exactly at every depth
    for (d <- 0 to 5) {
      val g = DistExtend.splitGroups(11, d)
      assert(g.map { case (lo, fk) => (lo until lo + fk) }.flatten.sorted === (0 until 11).toList)
    }
  }

  test("collect caps: batched driver bisection and distributed bisection agree on the contract") {
    val s = spark
    import s.implicits._
    // two blocks of 200 nodes each (ring + chords inside each block)
    val n = 400
    val ring = (0 until n).map { i =>
      val base = (i / 200) * 200
      (i.toLong, (base + (i + 1) % 200).toLong)
    }
    val chords = (0 until n by 7).map { i =>
      val base = (i / 200) * 200
      (i.toLong, (base + (i + 101) % 200).toLong)
    }
    val edges = undirectedUnit((ring ++ chords).distinct.filter(e => e._1 != e._2))
    val nodeW = (0L until n.toLong).map((_, 1L)).toDF("node", "weight")
    val part0 = (0L until n.toLong).map(nn => (nn, if (nn < 200) 0 else 2)).toDF("node", "block")
    val groups = List((0, 2), (2, 2))
    val lmax = 110L

    def contract(res: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val rows = res.collect().map(r => r.getLong(0) -> r.getAs[Number](1).intValue())
      assert(rows.length === n, s"$label: nodes lost")
      val byBlock = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      assert(byBlock.keySet === Set(0, 1, 2, 3), s"$label: blocks ${byBlock.keySet}")
      byBlock.values.foreach(w => assert(w <= lmax, s"$label: side over cap ($byBlock)"))
    }

    // trip the PER-BLOCK cap: both 200-member blocks route to distributed bisection
    contract(DistExtend.extendDoubling(
      spark, edges, nodeW, part0, groups, perfect = 100L, lmax = lmax, seed = 5L,
      perBlockCap = 100L), "distributed")
    // trip the BATCH cap: blocks fit individually (cap 1000) but not together (250)
    contract(DistExtend.extendDoubling(
      spark, edges, nodeW, part0, groups, perfect = 100L, lmax = lmax, seed = 5L,
      perBlockCap = 1000L, batchCap = 250L), "batched")
    // default path for reference
    contract(DistExtend.extendDoubling(
      spark, edges, nodeW, part0, groups, perfect = 100L, lmax = lmax, seed = 5L),
      "default")
  }

  test("k=64 deep extension: feasible, within 1.2x of the straight-to-k cut") {
    val edges = SyntheticGraph.zipfEdges(spark, n = 30000L, avgDeg = 6, seed = 9L)
      .persist()
    edges.count()

    // straight-to-k baseline: pure driver path (threshold above n)
    val straight = Partitioner(edges).setK(64).setEpsilon(0.05).setSeed(1L)
      .setDriverThreshold(1000000L).computePartition(spark)
    assert(straight.feasible, s"straight infeasible: imb=${straight.imbalance}")

    // deep path: coarsest ~2000 nodes -> k' = 8, extension to 64 while uncoarsening
    val deep = Partitioner(edges).setK(64).setEpsilon(0.05).setSeed(1L)
      .setDriverThreshold(2000L).computePartition(spark)
    assert(deep.feasible, s"deep infeasible: imb=${deep.imbalance} blockW=${deep.blockWeights.mkString(",")}")
    assert(deep.assignment.select(col("block")).distinct().count() === 64L)
    assert(deep.blockWeights.count(_ > 0) === 64, "every block populated")
    assert(deep.cut <= (1.2 * straight.cut).toLong,
      s"deep cut ${deep.cut} exceeds 1.2x straight cut ${straight.cut}")
    edges.unpersist()
  }
}
