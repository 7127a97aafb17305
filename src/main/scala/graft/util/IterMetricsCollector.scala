package graft.util

import graft.model.IterMetrics
import scala.collection.mutable

/** Driver-side per-iteration metrics collector (M6 role, `kaminpar.cc:39-68` summary
  * analog): every superstep of coarsening/refinement/JET appends one row; the
  * Partitioner drains the buffer into its Result, and callers can persist it next to
  * the run checkpoints (metrics.jsonl). Driver-singleton by design — all superstep
  * loops run on the driver.
  */
object IterMetricsCollector {
  private val buf = mutable.ArrayBuffer.empty[IterMetrics]

  def add(runId: String, level: Int, superstep: Int, moved: Long,
          cut: Long = -1L, imbalance: Double = -1.0, wallMs: Long = 0L): Unit =
    synchronized { buf += IterMetrics(runId, level, superstep, moved, cut, imbalance, wallMs) }

  /** Remove and return all rows for runId. */
  def drain(runId: String): Seq[IterMetrics] = synchronized {
    val (mine, rest) = buf.partition(_.runId == runId)
    buf.clear()
    buf ++= rest
    mine.toSeq
  }
}
