package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-at-a-time.
  *
  * The decode step is REAL where the JDK carries a codec:
  *
  *  - '''image''' payloads are PNG containers decoded through
  *    `javax.imageio.ImageIO` (pure-Java, headless-safe): the served
  *    width/height/sample statistics come from the DECODED raster, not
  *    from the container bytes.
  *  - '''audio''' payloads are WAV (8-bit mono PCM) containers decoded
  *    through `javax.sound.sampled.AudioSystem`: frame count and sample
  *    statistics come from the decoded PCM stream.
  *  - '''video''' has no JDK codec; its decoded columns are NULL (never
  *    fake values), while its REAL plumbing — the 1-video→N-frames row
  *    explosion a frame sampler produces — lives in [[sampleFrames]].
  *
  * The synthetic fixture ([[syntheticMedia]]) round-trips the corpus
  * text bytes through the same codecs (text → gray-8 PNG / 8-bit PCM
  * WAV), which keeps the decoded statistics arithmetically derivable
  * from the source text — that is what lets the SQL oracle verify a real
  * codec round trip end-to-end (gray-8 PNG and 8-bit PCM are lossless).
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

  /** Decoded per-media features. `width`/`height` are image-only;
    * `sample_sum` is the exact sum of decoded 8-bit samples (image
    * raster incl. padding pixels, audio PCM frames) — NULL for video,
    * where no decoder exists. `n_samples` counts decoded samples
    * (image: raster pixels; audio: PCM frames; video: raw payload
    * bytes). `feature` is an 8-bin mean profile of the DECODED samples.
    */
  final case class MediaFeature(
      media_id: Long,
      modality: String,
      n_samples: Long,
      width: Option[Long],
      height: Option[Long],
      sample_sum: Option[Long],
      feature: Array[Float])

  // ---- real codecs (JDK-builtin, no added dependency) -------------------

  /** Encode raw bytes as an 8-bit grayscale PNG: pixel(i) = byte(i),
    * width = ceil(sqrt(n)), height = ceil(n/width), zero-padded tail.
    * Lossless by construction, so [[decodeImage]] recovers the exact
    * sample sum.
    */
  def encodePng(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val w = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    val h = math.max(1, (n + w - 1) / w)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, if (i < n) payload(i) & 0xff else 0)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // memory-backed image stream, scoped to this call: ImageIO's default
    // stream factory uses a DISK cache (a temp file per encode/decode,
    // behind a synchronized registry) — per-row codec calls from 32
    // executor threads would serialize on it and pay a file
    // create/delete each. Scoping beats ImageIO.setUseCache(false),
    // which is a process-global flip a host application may not want.
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      if (!javax.imageio.ImageIO.write(img, "png", out))
        throw new java.io.IOException("no PNG writer available")
    } finally out.close()
    bos.toByteArray
  }

  /** Decode a PNG through ImageIO: (width, height, sum of gray samples). */
  def decodeImage(png: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(png)))
    if (img == null) throw new java.io.IOException("undecodable image payload")
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (img.getWidth, img.getHeight, sum)
  }

  /** Encode raw bytes as a WAV container (8 kHz 8-bit unsigned mono PCM,
    * sample(i) = byte(i)) — lossless, so [[decodeAudio]] recovers the
    * exact frame count and sample sum.
    */
  def encodeWav(payload: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(payload), fmt, payload.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV through AudioSystem: (frames, sum of 8-bit samples). */
  def decodeAudio(wav: Array[Byte]): (Long, Long) = {
    val dec = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    try {
      val frames = dec.readAllBytes()
      var sum = 0L
      var i = 0
      while (i < frames.length) { sum += frames(i) & 0xff; i += 1 }
      (frames.length.toLong, sum)
    } finally dec.close()
  }

  /** Feature extraction over a media frame: batch-shaped `mapPartitions`
    * (the Scala analog of `mapInPandas` — one iterator per partition, so
    * codec/library handles amortize per partition, not per row). Image
    * and audio payloads are DECODED through the real JDK codecs; video
    * rows carry NULL decoded columns (no JDK video codec — an honest
    * absence, not a fake).
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
        // per-partition init would go here (decoder/model handles); each
        // payload is decoded ONCE and every served statistic derives
        // from the same decoded sample array
        it.map { case (id, mod, payload) =>
          mod match {
            // the payload column is declared nullable: a NULL payload of
            // any modality yields a zero row, never an NPE'd task
            case _ if payload == null =>
              MediaFeature(id, mod, 0L, None, None, None, new Array[Float](8))
            case "image" =>
              val (w, h, samples) = decodedImageSamples(payload)
              MediaFeature(id, mod, w.toLong * h, Some(w.toLong), Some(h.toLong),
                Some(sampleSum(samples)), binProfile(samples))
            case "audio" =>
              val samples = decodedAudioSamples(payload)
              MediaFeature(id, mod, samples.length.toLong, None, None,
                Some(sampleSum(samples)), binProfile(samples))
            case _ =>
              val n = if (payload == null) 0L else payload.length.toLong
              MediaFeature(id, mod, n, None, None, None, new Array[Float](8))
          }
        }
      }
  }

  /** One ImageIO decode: (width, height, gray samples row-major). */
  private def decodedImageSamples(png: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(png)))
    if (img == null) throw new java.io.IOException("undecodable image payload")
    val raster = img.getRaster
    val out = new Array[Int](img.getWidth * img.getHeight)
    var i = 0
    while (i < out.length) {
      out(i) = raster.getSample(i % img.getWidth, i / img.getWidth, 0)
      i += 1
    }
    (img.getWidth, img.getHeight, out)
  }

  private def decodedAudioSamples(wav: Array[Byte]): Array[Int] = {
    val dec = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    try dec.readAllBytes().map(_ & 0xff)
    finally dec.close()
  }

  private def sampleSum(samples: Array[Int]): Long = {
    var sum = 0L
    var i = 0
    while (i < samples.length) { sum += samples(i); i += 1 }
    sum
  }

  /** 8-bin mean profile of decoded samples, normalized to [0,1]. */
  private def binProfile(samples: Array[Int]): Array[Float] = {
    val f = new Array[Float](8)
    if (samples.nonEmpty) {
      var i = 0
      while (i < samples.length) { f(i % 8) += samples(i) / 255.0f; i += 1 }
      val perBin = math.max(1, samples.length / 8)
      var j = 0
      while (j < 8) { f(j) /= perBin; j += 1 }
    }
    f
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

  /** Build a synthetic media frame from the documents table: the text
    * bytes are round-tripped through the REAL containers — gray-8 PNG
    * for image rows, 8-bit PCM WAV for audio rows — so decode exercises
    * genuine codecs while the decoded statistics stay derivable from the
    * source text (what the SQL oracle checks). Video rows keep raw bytes
    * (no JDK video codec to target).
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val encoded = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (id % 3) match {
            case 0 => (id, "image", encodePng(payload), "image/png")
            case 1 => (id, "audio", encodeWav(payload), "audio/wav")
            case _ => (id, "video", payload, "application/octet-stream")
          }
        }
      }.toDF("media_id", "modality", "payload", "mime")
    encoded
      .withColumn("width", lit(null).cast("int"))
      .withColumn("height", lit(null).cast("int"))
      .withColumn("duration_ms", lit(null).cast("long"))
  }
}
