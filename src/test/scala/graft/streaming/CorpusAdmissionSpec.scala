package graft.streaming

import graft.SparkSpec
import graft.text.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous corpus admission: a streaming ingest dedups every
  * micro-batch against the standing hash index and admits only the
  * keepers — so a duplicate arriving in a LATER batch is rejected by
  * what an EARLIER batch admitted. Retries rewrite their own batch
  * partition (idempotent), mirroring the pulse writer's redelivery
  * contract.
  */
class CorpusAdmissionSpec extends SparkSpec {

  test("later batches dedup against hashes admitted by earlier batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-admission").toString + "/idx"
    Dedup.ensureHashIndex(Seq((100L, "seed doc")).toDF("doc_id", "text"), idx)

    val verdicts = scala.collection.concurrent.TrieMap[Long, (Long, Long, Long)]()
    def admit(batch: DataFrame, id: Long): Unit = {
      val v = Dedup.incrementalVerdicts(batch, idx)
      v.collect().foreach(r =>
        verdicts(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3)))
      val kept = batch
        .join(v.filter(col("keep") === 1).select("doc_id"), Seq("doc_id"))
        .select(md5(col("text")).as("content_hash"), col("doc_id"))
        .groupBy("content_hash").agg(min("doc_id").as("corpus_keep_id"))
      Dedup.appendHashBatch(kept, idx, id + 1) // batch 0 is the seed corpus
    }

    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream.foreachBatch { (b: DataFrame, id: Long) => admit(b, id) }
      .start()
    try {
      input.addData((1L, "seed doc"), (2L, "brand new text a"))
      q.processAllAvailable()
      input.addData((3L, "brand new text a"), (4L, "brand new text b"))
      q.processAllAvailable()
    } finally q.stop()

    assert(verdicts(1L) == (1L, 0L, 0L), "dup of the seed corpus")
    assert(verdicts(2L) == (0L, 0L, 1L), "fresh in batch 0 → admitted")
    assert(verdicts(3L) == (1L, 0L, 0L), "dup of what batch 0 admitted")
    assert(verdicts(4L) == (0L, 0L, 1L))

    // retry idempotence: re-running a batch's admission (same batch id)
    // overwrites its partition instead of double-appending
    val before = graft.sources.RelationCache.parquet(spark, idx).count()
    val replay = Seq((2L, "brand new text a")).toDF("doc_id", "text")
      .select(md5(col("text")).as("content_hash"), col("doc_id").as("corpus_keep_id"))
    Dedup.appendHashBatch(replay, idx, 1L)
    assert(graft.sources.RelationCache.parquet(spark, idx).count() == before)
  }
}
