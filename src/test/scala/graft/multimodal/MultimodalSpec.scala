package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def payload(s: String) = s.getBytes("UTF-8")

  private def media = {
    import spark.implicits._
    Seq(
      (0L, "image", Multimodal.encodePng(payload("abcdefgh"))),
      (1L, "audio", Multimodal.encodeWav(payload("qrs"))),
      (2L, "video", payload("x" * 25000)))
      .toDF("media_id", "modality", "payload")
  }

  test("PNG round trip is lossless: ImageIO decodes the exact dimensions " +
      "and sample sum the encoder laid out") {
    val bytes = payload("hello world, png round trip")
    val png = Multimodal.encodePng(bytes)
    // a REAL container, not a passthrough: PNG magic, different bytes
    assert(png.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    val (w, h, sum) = Multimodal.decodeImage(png)
    val expectW = math.ceil(math.sqrt(bytes.length.toDouble)).toInt
    assert(w == expectW && h == (bytes.length + w - 1) / w)
    assert(sum == bytes.map(_ & 0xff).map(_.toLong).sum,
      "gray-8 PNG must round-trip the samples exactly")
  }

  test("WAV round trip is lossless: AudioSystem decodes the exact frame " +
      "count and sample sum") {
    val bytes = payload("pcm frames")
    val wav = Multimodal.encodeWav(bytes)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val (frames, sum) = Multimodal.decodeAudio(wav)
    assert(frames == bytes.length.toLong)
    assert(sum == bytes.map(_ & 0xff).map(_.toLong).sum)
  }

  test("extractFeatures decodes image/audio through the real codecs and " +
      "leaves video's decoded columns NULL") {
    val out = Multimodal.extractFeatures(media)
    assert(out.columns.toSeq == Seq("media_id", "modality", "n_samples",
      "width", "height", "sample_sum", "feature"))
    val rows = out.collect().sortBy(_.media_id)
    assert(rows.length == 3)
    // image: 8 bytes → 3x3 raster (9 samples incl. padding)
    assert(rows(0).width.contains(3L) && rows(0).height.contains(3L))
    assert(rows(0).n_samples == 9L)
    assert(rows(0).sample_sum.contains(payload("abcdefgh").map(_ & 0xff).map(_.toLong).sum))
    // audio: 3 PCM frames
    assert(rows(1).n_samples == 3L && rows(1).width.isEmpty)
    assert(rows(1).sample_sum.contains(payload("qrs").map(_ & 0xff).map(_.toLong).sum))
    // video: no decoder — honest NULLs, raw byte count only
    assert(rows(2).n_samples == 25000L && rows(2).sample_sum.isEmpty)
    assert(rows(2).width.isEmpty && rows(2).height.isEmpty)
    // determinism: same payload → same decoded feature
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(rows(0).feature.toSeq == again(0).feature.toSeq)
    assert(rows(0).feature.exists(_ > 0f), "decoded image samples feed the profile")
  }

  test("sampleFrames: video-only row explosion with bounded frame count") {
    val out = Multimodal.sampleFrames(media, stride = 10, maxFrames = 16)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Long]("media_id") == 2L)) // only the video
    // 25000 bytes / 10240 = 2 frames
    assert(rows.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 1))
  }

  test("syntheticMedia assigns modalities by id and round-trips text through " +
      "the real containers") {
    import spark.implicits._
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")).toDF("doc_id", "text")
    val out = Multimodal.syntheticMedia(docs).orderBy("media_id").collect()
    assert(out.map(_.getAs[String]("modality")).toSeq == Seq("image", "audio", "video"))
    assert(out.map(_.getAs[String]("mime")).toSeq ==
      Seq("image/png", "audio/wav", "application/octet-stream"))
    // image payload is a PNG whose decoded samples are the text bytes
    val (w, h, sum) = Multimodal.decodeImage(out(0).getAs[Array[Byte]]("payload"))
    assert(w * h >= 5 && sum == payload("alpha").map(_ & 0xff).map(_.toLong).sum)
    // audio payload is a WAV whose frames are the text bytes
    val (frames, asum) = Multimodal.decodeAudio(out(1).getAs[Array[Byte]]("payload"))
    assert(frames == 4L && asum == payload("beta").map(_ & 0xff).map(_.toLong).sum)
    // video payload stays raw
    assert(new String(out(2).getAs[Array[Byte]]("payload"), "UTF-8") == "gamma")
  }
}
