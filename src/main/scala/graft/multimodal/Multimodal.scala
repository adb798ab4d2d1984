package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-at-a-time.
  *
  * The Spark-side contract is real and tested — schema, partition-sized
  * batching via `mapPartitions`, deterministic output shape — while the
  * actual media decode is STUBBED (no image/audio libs in this container):
  * `decodeStub` produces a deterministic fake derived from the bytes, so
  * correctness of the plumbing (row counts, schema, ordering, partition
  * behaviour) is fully checkable. Swapping in a real decoder is a 1-line
  * change inside the partition function; nothing in the plan changes.
  *
  * Scale shape: per-row decode is embarrassingly parallel; the operator
  * repartitions to spread large blobs evenly (binary columns defeat
  * row-group skew heuristics) and keeps decoded features narrow so the
  * downstream shuffle carries features, never raw media.
  */
object Multimodal {

  /** Typed media row: id + opaque payload + declared modality/shape. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  final case class MediaFeature(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      feature: Array[Float] // fixed 8-dim stub feature
  )

  /** STUB decoder: deterministic 8-dim "feature" from payload bytes.
    * Replace with a real decode (JPEG → pixels → embed, PCM → spectrogram)
    * without touching the operator: only this function changes.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        f(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      val n = math.max(1, payload.length / 8)
      var j = 0
      while (j < 8) { f(j) /= n; j += 1 }
    }
    f
  }

  /** Feature extraction over a media frame: batch-shaped `mapPartitions`
    * (the Scala analog of `mapInPandas` — one iterator per partition, so a
    * real decoder can amortize model/library init per partition, not per
    * row).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("payload"))
      // round-robin spread of the blobs (the doc's skew promise): a few
      // huge videos among many small images otherwise land in one
      // file-split task while the rest idle — binary payloads defeat the
      // size-based split heuristics that balance numeric columns
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (decoder/model handles)
        it.map { case (id, mod, payload) =>
          MediaFeature(id, mod, if (payload == null) 0L else payload.length.toLong,
            decodeStub(payload))
        }
      }
  }

  /** Frame sampling stub for video: emit every `stride`-th synthetic frame
    * index with a per-frame stub feature — the row-explosion shape (1 video
    * → N frames) that a real sampler produces, with deterministic content.
    */
  def sampleFrames(media: DataFrame, stride: Int = 10, maxFrames: Int = 16): DataFrame = {
    val n = least(lit(maxFrames),
      greatest(lit(1), (length(col("payload")) / lit(1024 * stride)).cast("int")))
    media
      .filter(col("modality") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), n - 1)).as("frame_idx"),
        length(col("payload")).as("n_bytes"))
      .withColumn("frame_hash", xxhash64(col("media_id"), col("frame_idx"), col("n_bytes")))
  }

  /** Build a synthetic media frame from the documents table (payload =
    * UTF-8 bytes) — used by tests/bench to exercise the plumbing with the
    * driver-provided data.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))
}
