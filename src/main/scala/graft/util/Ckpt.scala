package graft.util

import org.apache.spark.sql.DataFrame
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Superstep checkpointing for iterative state tables.
  *
  * Why not `localCheckpoint`: Spark's checkpoint keeps the ORIGIN plan's statistics on
  * the resulting LogicalRDD. In an iterative loop each round's stats are a product
  * over the previous round's stats, so the sizeInBytes BigInt grows exponentially in
  * digit count and optimizer stats walks (join selection, runtime-filter injection)
  * degrade from microseconds to minutes after ~15 supersteps. A storage round-trip
  * resets leaf statistics to real file sizes, keeps every per-round plan O(1), and is
  * the local-mode analog of the Iceberg snapshot-per-superstep checkpointing the
  * engine uses in production — which is also what makes convergence loops resumable
  * (north star: per-iteration metrics + resumable convergence).
  */
object Ckpt {
  private lazy val baseDir: String =
    sys.env.getOrElse(
      "GRAFT_CKPT_DIR",
      Files.createTempDirectory("graft-ckpt").toString
    )
  private val counter = new AtomicInteger(0)

  /** Materialize df to parquet and read it back (flat lineage, fresh stats). */
  def apply(df: DataFrame, tag: String = "state"): DataFrame = {
    val path = s"$baseDir/$tag-${counter.incrementAndGet()}"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
