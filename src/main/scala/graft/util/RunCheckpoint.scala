package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Durable, resumable run checkpointing (north rule: resumable convergence with
  * per-partition lineage + per-iteration metrics).
  *
  * Layout under `root/<runId>/`:
  *   state/<superstep>/   parquet snapshot of the iteration state (the "per-partition
  *                        lineage": each superstep's state is a persisted table whose
  *                        files are the partition-level provenance of the next)
  *   metrics.jsonl        one row per superstep (M6-style)
  *   _DONE                marker written on successful completion
  *
  * In production these are Iceberg snapshots of a state table; locally plain parquet
  * directories. A restarted run finds the latest complete superstep and continues
  * from it.
  */
final class RunCheckpoint(val root: String, val runId: String) {
  private val dir = Paths.get(root, runId)
  Files.createDirectories(dir.resolve("state"))

  private def stateDir(step: Int) = dir.resolve("state").resolve(step.toString)

  /** Persist the state of a finished superstep. Atomic-enough: parquet write goes to
    * the final path, the _COMMIT marker is written after.
    */
  def save(step: Int, state: DataFrame): DataFrame = {
    val p = stateDir(step)
    state.write.mode("overwrite").parquet(p.toString)
    Files.writeString(p.resolve("_COMMIT"), "ok")
    state.sparkSession.read.parquet(p.toString)
  }

  /** Append the per-superstep metrics row (M6-style) to metrics.jsonl. */
  def appendMetrics(step: Int, metrics: Map[String, Any]): Unit = {
    val json = metrics.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString(s"""{"superstep":$step,""", ",", "}\n")
    Files.writeString(
      dir.resolve("metrics.jsonl"), json,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  /** Latest committed superstep, if any (named states are ignored). */
  def latestStep: Option[Int] = {
    val stateRoot = dir.resolve("state")
    if (!Files.isDirectory(stateRoot)) None
    else Files.list(stateRoot).iterator().asScala
      .filter(p => Files.exists(p.resolve("_COMMIT")))
      .flatMap(p => p.getFileName.toString.toIntOption)
      .foldLeft(Option.empty[Int])((acc, s) => Some(acc.fold(s)(math.max(_, s))))
  }

  // ---- named states: multi-artifact pipelines (e.g. the partitioner's coarsening
  // levels + per-level refined partitions) address stages by name ----

  private def namedDir(name: String) = dir.resolve("state").resolve(name)

  def hasNamed(name: String): Boolean =
    Files.exists(namedDir(name).resolve("_COMMIT"))

  def saveNamed(name: String, state: DataFrame): DataFrame = {
    val p = namedDir(name)
    state.write.mode("overwrite").parquet(p.toString)
    Files.writeString(p.resolve("_COMMIT"), "ok")
    state.sparkSession.read.parquet(p.toString)
  }

  def loadNamed(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(namedDir(name).toString)

  // ---- scalar metadata: small facts a resumed run must NOT re-derive from the data
  // (e.g. the partitioner's extension-doubling count — re-deriving it from the
  // distinct block count undercounts when blocks are empty) ----

  def putMeta(key: String, value: String): Unit = {
    Files.createDirectories(dir.resolve("meta"))
    Files.writeString(dir.resolve("meta").resolve(key), value)
  }

  def getMeta(key: String): Option[String] = {
    val p = dir.resolve("meta").resolve(key)
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  def load(spark: SparkSession, step: Int): DataFrame =
    spark.read.parquet(stateDir(step).toString)

  def markDone(): Unit = Files.writeString(dir.resolve("_DONE"), "ok")
  def isDone: Boolean = Files.exists(dir.resolve("_DONE"))

  def metricsLines: Seq[String] =
    if (Files.exists(dir.resolve("metrics.jsonl")))
      Files.readAllLines(dir.resolve("metrics.jsonl")).asScala.toSeq
    else Seq.empty
}

object RunCheckpoint {
  def apply(runId: String, root: String = sys.env.getOrElse(
      "GRAFT_RUN_DIR", Files.createTempDirectory("graft-runs").toString)): RunCheckpoint =
    new RunCheckpoint(root, runId)
}
