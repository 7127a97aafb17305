package graft.util

import org.apache.spark.sql.DataFrame

/** Small shared utilities for the r06 job-overlap and block-release patterns
  * (previously inlined at each call site).
  */
object Par {

  /** Run independent thunks (typically Spark actions) concurrently on a private
    * fixed pool and await all results — guide §2.6 "overlap independent jobs".
    * Results are positional; callers must only pass order-insensitive work.
    */
  def awaitAll[A](thunks: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(thunks.size, Runtime.getRuntime.availableProcessors())))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val fs = thunks.map(t => Future(t()))
      fs.map(f => Await.result(f, Duration.Inf))
    } finally pool.shutdown()
  }

  /** Unpersist the RDD blocks behind a lazy `localCheckpoint` staging table.
    * Only call once nothing can re-execute a plan referencing them (their
    * lineage is truncated, so an evicted block cannot be recomputed).
    */
  def releaseLocalCkpt(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ =>
    }
}
