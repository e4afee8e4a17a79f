package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the decode / feature-extract stages a training
  * pipeline needs. The media CODEC layer is STUBBED (no image/audio libs in
  * this container) behind [[FakeCodec]] -- a deterministic stand-in -- while
  * everything Spark-side (schema, partitioning, batched per-partition
  * execution, feature shape) is real and tested.
  */
object Multimodal {

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
      n_bytes: Long,
      byte_mean_x1000: Long, // deterministic integer "feature"
      histogram16: Array[Long], // 16-bin byte histogram
      frames_sampled: Int
  )

  /** STUB codec: where a real pipeline would decode JPEG/WAV/H264, this
    * derives deterministic pseudo-features from the raw bytes. Swap with a
    * real codec (e.g. javax.imageio / ffmpeg bindings) in production. */
  object FakeCodec {
    def features(r: MediaRow): MediaFeatures = {
      val bytes = r.media
      var sum = 0L
      val hist = new Array[Long](16)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        hist(b >>> 4) += 1
        i += 1
      }
      val mean = if (bytes.length == 0) 0L else sum * 1000L / bytes.length
      val frames = r.kind match {
        case "video" => math.max(1, bytes.length / 4096) // fake frame sampling
        case "audio" => math.max(1, bytes.length / 1024)
        case _       => 1
      }
      MediaFeatures(r.media_id, r.kind, bytes.length.toLong, mean, hist, frames)
    }
  }

  /** Build a media table from the documents table (payload = UTF-8 bytes of
    * the text -- a deterministic opaque binary stand-in). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("media"),
      lit(64).as("width"),
      lit(64).as("height"),
      lit(16000).as("sample_rate")
    )

  /** Batched per-partition feature extraction (the Scala analogue of
    * mapInPandas: one JVM call per batch, vectorizable codec inside).
    * Repartitions by media_id so decode work spreads evenly regardless of
    * input file layout. */
  def extractFeatures(spark: SparkSession, media: DataFrame, partitions: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .repartition(partitions, col("media_id"))
      .as[MediaRow]
      .mapPartitions { it => it.map(FakeCodec.features) }
  }
}
