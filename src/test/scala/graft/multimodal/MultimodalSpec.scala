package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      (0L, "image", "abcdefgh".getBytes("UTF-8")),
      (1L, "audio", Array.emptyByteArray),
      (2L, "video", ("x" * 25000).getBytes("UTF-8")))
      .toDF("media_id", "modality", "payload")
  }

  test("extractFeatures: schema, one row per input, deterministic stub") {
    val out = Multimodal.extractFeatures(media)
    assert(out.columns.toSeq == Seq("media_id", "modality", "n_bytes", "feature"))
    val rows = out.collect().sortBy(_.media_id)
    assert(rows.length == 3)
    assert(rows(0).n_bytes == 8L && rows(1).n_bytes == 0L && rows(2).n_bytes == 25000L)
    assert(rows(0).feature.length == 8)
    // determinism: same payload → same feature
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(rows(0).feature.toSeq == again(0).feature.toSeq)
  }

  test("sampleFrames: video-only row explosion with bounded frame count") {
    val out = Multimodal.sampleFrames(media, stride = 10, maxFrames = 16)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Long]("media_id") == 2L)) // only the video
    // 25000 bytes / 10240 = 2 frames
    assert(rows.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 1))
  }

  test("syntheticMedia assigns modalities by id and preserves bytes") {
    import spark.implicits._
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")).toDF("doc_id", "text")
    val out = Multimodal.syntheticMedia(docs).orderBy("media_id").collect()
    assert(out.map(_.getAs[String]("modality")).toSeq == Seq("image", "audio", "video"))
    assert(new String(out(0).getAs[Array[Byte]]("payload"), "UTF-8") == "alpha")
  }
}
