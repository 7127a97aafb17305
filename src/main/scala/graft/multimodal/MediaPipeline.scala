package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with typed
  * metadata, processed by batched per-partition transforms.
  *
  * The Spark-side machinery here — schema, partitioning, batch shape, typed
  * mapPartitions pipeline (the Scala analog of a Pandas-UDF `mapInPandas` stage) — is
  * real and tested. The actual codec step is a clearly marked STUB (`decodeStub`):
  * image/audio libraries are not in this container, so the decode produces a
  * deterministic fake "decoded frame" from the bytes. Swapping `decodeStub` for a real
  * JNI/codec call changes nothing else in the pipeline.
  */
object MediaPipeline {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      media: Array[Byte], // opaque payload
      width: Int,
      height: Int,
      sample_rate: Int
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      bytes: Long,
      // STUBbed decode output: 16-bin byte histogram as the stand-in feature vector
      features: Array[Double],
      frames_sampled: Int
  )

  /** Deterministic synthetic media table (seeded; no external data): `n` rows of fake
    * payloads whose bytes are a seeded hash stream — stands in for the opaque binary
    * column of a real Iceberg media table.
    */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val rnd = new scala.util.Random(seed ^ (i * 0x9e3779b97f4a7c15L))
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 256 + rnd.nextInt(768)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      MediaRow(i, kind, bytes, 64 + rnd.nextInt(512), 64 + rnd.nextInt(512), 16000)
    }
  }

  /** STUB decode: a real implementation would decode the image/audio frame here.
    * Deterministic fake: 16-bin byte histogram, normalized. Marked clearly so the
    * swap-in point is obvious.
    */
  private def decodeStub(media: Array[Byte]): Array[Double] = {
    // ??? <- real codec call goes here (e.g. TwelveMonkeys/JavaCV decode)
    val hist = new Array[Double](16)
    var i = 0
    while (i < media.length) { hist((media(i) & 0xff) / 16) += 1.0; i += 1 }
    val total = media.length.toDouble
    hist.map(_ / total)
  }

  /** Batched feature extraction: one decode pass per partition (the mapInPandas batch
    * shape), emitting typed feature rows. Frame sampling for video kind: every
    * `frameStride`-th 64-byte window is "a frame".
    */
  def extractFeatures(media: Dataset[MediaRow], frameStride: Int = 4): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val feats = decodeStub(row.media)
        val frames =
          if (row.kind == "video") math.max(1, row.media.length / 64 / frameStride) else 1
        MediaFeatures(row.media_id, row.kind, row.media.length.toLong, feats, frames)
      }
    }
  }

  /** Feature stats per kind — the downstream aggregation a curation pipeline runs. */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features
      .toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).cast("long").as("items"),
        sum(col("bytes")).as("total_bytes"),
        round(avg(element_at(col("features"), 1)), 8).as("avg_bin0"),
        sum(col("frames_sampled")).cast("long").as("frames")
      )
}
