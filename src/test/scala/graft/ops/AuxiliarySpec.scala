package graft.ops

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Auxiliary distributed algorithms (SURVEY O29) + the optional coarseners
  * (O10 overlay, O11 sparsification).
  */
class AuxiliarySpec extends SparkFunSuite {

  private def ringPlusChords(n: Int) = {
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val chords = (0 until n by 7).map(i => (i.toLong, ((i + n / 2) % n).toLong))
    undirectedUnit((ring ++ chords).distinct.filter(e => e._1 != e._2))
  }

  test("border nodes: exactly the endpoints of cut edges") {
    val s = spark
    import s.implicits._
    // path 0-1-2-3, blocks {0,1} vs {2,3} -> border = {1, 2}
    val edges = undirectedUnit(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val part = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1)).toDF("node", "block")
    val border = Auxiliary.borderNodes(edges, part).collect().map(_.getLong(0)).toSet
    assert(border === Set(1L, 2L))
  }

  test("MIS is independent and maximal") {
    val edges = ringPlusChords(60)
    val mis = Auxiliary.maximalIndependentSet(spark, edges, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent: no edge inside the set
    assert(!es.exists { case (a, b) => mis(a) && mis(b) }, "set not independent")
    // maximal: every non-member has a member neighbor
    val nodes = es.map(_._1).toSet
    val nbrs = es.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    nodes.diff(mis).foreach { v =>
      assert(nbrs(v).exists(mis), s"node $v could join the set")
    }
    // determinism
    val again = Auxiliary.maximalIndependentSet(spark, edges.repartition(7), seed = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(again === mis)
  }

  test("greedy coloring is proper and complete") {
    val edges = ringPlusChords(60)
    val colors = Auxiliary.greedyColoring(spark, edges, seed = 3L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(colors.values.forall(_ >= 0), "uncolored nodes remain")
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    es.foreach { case (a, b) => assert(colors(a) != colors(b), s"edge ($a,$b) monochrome") }
    // ring + sparse chords: small palette expected
    assert(colors.values.max <= 8, s"palette too large: ${colors.values.max + 1}")
  }
}

class OverlaySparsifySpec extends SparkFunSuite {

  test("overlay clustering refines every input clustering") {
    val s = spark
    import s.implicits._
    // two cliques joined by one edge: single LP merges freely; the overlay of two
    // seeds may only keep merges BOTH runs agree on
    val k1 = for { a <- 0 until 6; b <- a + 1 until 6 } yield (a.toLong, b.toLong)
    val k2 = for { a <- 6 until 12; b <- a + 1 until 12 } yield (a.toLong, b.toLong)
    val edges = undirectedUnit(k1 ++ k2 ++ Seq((5L, 6L)))
    val nodeW = (0L until 12L).map((_, 1L)).toDF("node", "weight")
    val overlay = graft.partition.DistCoarsener
      .overlayCluster(spark, edges, nodeW, cap = 6L, t = 2, seed = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single1 = graft.partition.DistCoarsener
      .lpCluster(spark, edges, nodeW, cap = 6L, seed = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single2 = graft.partition.DistCoarsener
      .lpCluster(spark, edges, nodeW, cap = 6L, seed = 5L + 7919L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // refinement property: overlay-equal => equal in BOTH inputs
    for (u <- 0L until 12L; v <- 0L until 12L if overlay(u) == overlay(v)) {
      assert(single1(u) == single1(v) && single2(u) == single2(v),
        s"overlay merged $u,$v but an input clustering separated them")
    }
  }

  test("HEM clustering: a matching (clusters of size <= 2), heavy edges preferred") {
    val s = spark
    import s.implicits._
    // triangle a-b (w=10), b-c (w=1), a-c (w=1) plus a path tail c-d (w=5)
    val edges = undirected(Seq((0L, 1L, 10L), (1L, 2L, 1L), (0L, 2L, 1L), (2L, 3L, 5L)))
    val nodeW = (0L to 3L).map((_, 1L)).toDF("node", "weight")
    val labels = graft.partition.DistCoarsener
      .hemCluster(spark, edges, nodeW, cap = 2L, seed = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val groups = labels.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    assert(groups.values.forall(_.size <= 2), s"not a matching: $groups")
    // the heavy edges are matched: {0,1} together and {2,3} together
    assert(labels(0L) === labels(1L), s"heaviest edge unmatched: $labels")
    assert(labels(2L) === labels(3L), s"w=5 edge unmatched: $labels")
    // matched pairs are real edges
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    groups.values.filter(_.size == 2).foreach { g =>
      val Seq(a, b) = g.toSeq.sorted
      assert(es((a, b)), s"matched non-edge ($a,$b)")
    }
    // determinism under repartition
    val again = graft.partition.DistCoarsener
      .hemCluster(spark, edges.repartition(5), nodeW, cap = 2L, seed = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === labels)
  }

  test("HEM keeps isolated nodes as singleton clusters (no node/weight loss)") {
    val s = spark
    import s.implicits._
    // one edge 0-1 plus isolated nodes 2, 3: the coloring domain is {0,1} only, so a
    // non-left join would drop 2 and 3 from the clustering entirely
    val edges = undirected(Seq((0L, 1L, 2L)))
    val nodeW = Seq((0L, 1L), (1L, 1L), (2L, 5L), (3L, 1L)).toDF("node", "weight")
    val labels = graft.partition.DistCoarsener
      .hemCluster(spark, edges, nodeW, cap = 10L, seed = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet === Set(0L, 1L, 2L, 3L), s"nodes lost: $labels")
    assert(labels(2L) === 2L && labels(3L) === 3L, "isolated nodes must be singletons")
    assert(labels(0L) === labels(1L))
  }

  test("HEM respects the cluster weight cap") {
    val s = spark
    import s.implicits._
    val edges = undirected(Seq((0L, 1L, 10L), (1L, 2L, 8L)))
    val nodeW = Seq((0L, 3L), (1L, 3L), (2L, 1L)).toDF("node", "weight")
    // cap 4: 0-1 (3+3=6) cannot match; 1-2 (3+1=4) can
    val labels = graft.partition.DistCoarsener
      .hemCluster(spark, edges, nodeW, cap = 4L, seed = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(0L) === 0L, "over-cap pair must stay split")
    assert(labels(1L) === labels(2L), "fitting pair should match")
  }

  test("sparsify keeps the heaviest edges symmetrically within the budget") {
    val s = spark
    import s.implicits._
    // 30 undirected edges with weights 1..30
    val raw = (0 until 30).map(i => (i.toLong, (i + 40).toLong, (i + 1).toLong))
    val edges = undirected(raw)
    val kept = graft.partition.DistCoarsener.sparsify(spark, edges, targetM = 20L)
    val rows = kept.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length <= 24 && rows.length >= 16, s"kept ${rows.length} directed edges")
    // symmetric: (a,b) kept iff (b,a) kept
    val set = rows.map(t => (t._1, t._2)).toSet
    assert(set.forall { case (a, b) => set((b, a)) })
    // the heaviest edges survive
    assert(rows.map(_._3).min > 15L, s"kept a light edge: ${rows.map(_._3).min}")
  }
}
