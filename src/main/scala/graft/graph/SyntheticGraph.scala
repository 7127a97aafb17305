package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic link graphs generated in-plan (no IO): Zipf-ish in-degree
  * skew like a web graph (hub pages), seeded hashes for reproducibility across runs
  * AND partitionings. Used by the scaling benchmark (compute-bound input) and skew
  * tests; generation is a `range` + `explode` — embarrassingly parallel.
  */
object SyntheticGraph {

  /** Symmetric edge table with ~`avgDeg` out-links per node and power-law hub skew:
    * target = floor(n * u^gamma) where u is a per-(src,k) seeded uniform; gamma > 1
    * concentrates mass on low ids (hubs).
    */
  def zipfEdges(
      spark: SparkSession,
      n: Long,
      avgDeg: Int = 8,
      gamma: Double = 3.0,
      seed: Long = 42L
  ): DataFrame = {
    val deg = (pmod(xxhash64(col("id"), lit(seed)), lit(2L * avgDeg - 1)) + 1L).cast("int")
    val raw = spark.range(n)
      .select(col("id").as("src"), explode(sequence(lit(0), deg - 1)).as("k"))
      .select(
        col("src"),
        floor(
          lit(n.toDouble) *
            pow(
              (pmod(xxhash64(col("src"), col("k"), lit(seed)), lit(1000000000L)).cast("double") + 0.5) / 1e9,
              lit(gamma)
            )
        ).cast("long").as("dst")
      )
      .filter(col("src") =!= col("dst"))
      .withColumn("w", lit(1L))
    Graphs.symmetrize(raw)
  }
}
