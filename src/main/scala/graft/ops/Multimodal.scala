package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the pipeline as opaque `binary` columns with a typed metadata
  * struct. The Spark-side mechanics — schema, partition-friendly
  * per-row independence, batched per-partition processing — are real;
  * the actual codec calls are STUBBED (no image/audio libraries in
  * this environment) behind `decodeStub`, which produces a
  * deterministic fake feature vector so the plumbing is testable.
  *
  * At 100 TB: payload bytes never shuffle — every op here is a narrow
  * map over the scan; only extracted features (small, fixed-width)
  * flow into joins/aggregations downstream.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  /** Synthesize a media table from the documents table: payload =
    * UTF-8 bytes of the text (a deterministic stand-in for real
    * image/audio bytes), metadata derived from doc fields. */
  def synthesize(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        lit(16000).as("sampleRate")).as("meta"))

  /** STUB decode: a real implementation would call an image/audio
    * codec here (per partition, reusing decoder instances). The fake
    * "features" are a 16-bin byte histogram normalised to [0,1] —
    * deterministic, so tests can assert on it. The mapPartitions
    * shape (iterator→iterator, no materialisation of the partition)
    * is the production pattern. */
  def decodeStub(media: Dataset[MediaRow])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would open codecs once here
      rows.map { r =>
        val hist = new Array[Float](16)
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xFF) >> 4) += 1f
          i += 1
        }
        val n = math.max(r.payload.length, 1).toFloat
        var j = 0
        while (j < 16) { hist(j) /= n; j += 1 }
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length.toLong, hist)
      }
    }
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * fixed-size frames, keep every `stride`-th — pure Spark array ops,
    * no UDF; the real decoder slots into [[decodeStub]]. */
  def frameSample(df: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    df.select(
      col("media_id"),
      col("meta.kind").as("kind"),
      expr(
        s"""filter(
           |  transform(sequence(0, greatest(int(length(payload) / $frameBytes) - 1, 0)),
           |            i -> named_struct('frame_no', i,
           |                              'bytes', substring(payload, i * $frameBytes + 1, $frameBytes))),
           |  f -> f.frame_no % $stride = 0)""".stripMargin).as("frames"))
      .withColumn("n_frames", size(col("frames")).cast("long"))
}
