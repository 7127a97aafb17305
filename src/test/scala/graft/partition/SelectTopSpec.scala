package graft.partition

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The balancers' sort-free candidate selection (round 5: replaced the per-block
  * sort windows). Properties under test:
  *  - rows strictly above the boundary bucket are ALWAYS selected (no best mover
  *    is ever dropped by the approximation);
  *  - the selected set is bounded near the per-group target (the driver-collect
  *    guarantee), including under total score ties (the window-free hazard case);
  *  - a group whose total weight fits the target is taken whole;
  *  - deterministic under repartitioning (seeded hashes only).
  */
class SelectTopSpec extends SparkFunSuite {

  private def candDf(rows: Seq[(Long, Int, Long, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "cur", "nw", "relGain")
  }

  test("selects the top-score prefix, bounded near the target") {
    val n = 10000
    val cand = candDf((0 until n).map(i => (i.toLong, 0, 1L, i.toDouble)))
    val rows = DistRefiner.selectTopByScore(
      cand, "cur", "relGain", Map(0 -> 100L), seed = 7L, keep = Seq("src", "relGain"))
    val scores = rows.map(_.getAs[Double]("relGain"))
    assert(rows.length >= 90 && rows.length <= 300, s"got ${rows.length}")
    // nothing above the selection's own minimum was dropped: the selected set is a
    // contiguous top segment up to boundary-bucket granularity (bucket width ~10)
    assert(scores.min >= n - rows.length - 16, s"min=${scores.min} len=${rows.length}")
    assert(scores.max === n - 1.0)
  }

  test("total ties cannot blow up the selection (degenerate-score hazard)") {
    val n = 10000
    val cand = candDf((0 until n).map(i => (i.toLong, 0, 1L, 5.0)))
    val rows = DistRefiner.selectTopByScore(
      cand, "cur", "relGain", Map(0 -> 100L), seed = 7L, keep = Seq("src"))
    // all rows land in one bucket; the boundary coin keeps ~target of them
    assert(rows.length >= 30 && rows.length <= 400, s"got ${rows.length}")
  }

  test("a group whose weight fits the target is taken whole; others filtered") {
    val cand = candDf(
      (0 until 50).map(i => (i.toLong, 1, 1L, i.toDouble)) ++
        (0 until 5000).map(i => (1000L + i, 2, 1L, i.toDouble)))
    val rows = DistRefiner.selectTopByScore(
      cand, "cur", "relGain", Map(1 -> 100L, 2 -> 50L), seed = 3L,
      keep = Seq("src", "cur"))
    val byGrp = rows.groupBy(_.getAs[Int]("cur")).view.mapValues(_.length).toMap
    assert(byGrp(1) === 50) // fits entirely
    assert(byGrp(2) >= 45 && byGrp(2) <= 200, s"got ${byGrp(2)}")
  }

  test("groups absent from the target map are never selected") {
    val cand = candDf(Seq((1L, 0, 1L, 1.0), (2L, 9, 1L, 9.0)))
    val rows = DistRefiner.selectTopByScore(
      cand, "cur", "relGain", Map(0 -> 10L), seed = 1L, keep = Seq("src", "cur"))
    assert(rows.map(_.getAs[Long]("src")).toSet === Set(1L))
  }

  test("deterministic under repartitioning") {
    val base = (0 until 2000).map(i => (i.toLong, i % 3, 1L + i % 4, (i % 97).toDouble))
    val a = DistRefiner.selectTopByScore(
      candDf(base), "cur", "relGain", Map(0 -> 50L, 1 -> 50L, 2 -> 50L), 11L, Seq("src"))
      .map(_.getAs[Long]("src")).toSet
    val b = DistRefiner.selectTopByScore(
      candDf(base).repartition(7), "cur", "relGain", Map(0 -> 50L, 1 -> 50L, 2 -> 50L),
      11L, Seq("src")).map(_.getAs[Long]("src")).toSet
    assert(a === b)
  }
}
