package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import SketchStream.KeyEvent

/** The streaming KMV fold must land on EXACTLY the batch sketch's
  * estimate for any batch split of the same events — the k smallest
  * distinct hashes are order-free, so the per-batch state merge cannot
  * drift from the one-shot aggregate.
  */
class SketchStreamSpec extends SparkSpec {

  private val K = 16

  test("streamed KMV estimates equal the batch sketch after any split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 3 groups with known cardinalities (60 / 7 / 200 distinct keys,
    // with repeats); group "b" stays under k → exact branch
    val all = (0 until 60).map(i => KeyEvent("a", i.toLong)) ++
      (0 until 30).map(i => KeyEvent("b", (i % 7).toLong)) ++
      (0 until 400).map(i => KeyEvent("c", (i % 200).toLong))

    val input = MemoryStream[KeyEvent]
    val query = SketchStream(input.toDS(), K)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      val (first, second) = all.splitAt(all.length / 3)
      input.addData(first: _*)
      query.processAllAvailable()
      input.addData(second: _*)
      query.processAllAvailable()
    } finally query.stop()

    // latest streamed estimate per group
    val streamed = spark.table("kmv_stream").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

    // batch twin over the SAME events in one shot
    import graft.functions.expressions.SketchAggregates.boundedMinK
    val batch = all.toDF("group", "key")
      .select(col("group"),
        xxhash64(col("key")).bitwiseXOR(lit(Long.MinValue)).as("u"))
      .distinct()
      .groupBy(col("group"))
      .agg(boundedMinK(col("u"), K).as("us"))
      .collect()
      .map(r => r.getString(0) ->
        graft.operators.Sketches.kmvEstimate(r.getSeq[Long](1).toArray, K))
      .toMap

    assert(streamed == batch,
      s"stream/batch estimates diverged: $streamed vs $batch")
    // the under-k group counts exactly; estimator ACCURACY is
    // SketchesSpec's job (k=32 over the real testdata) — k=16 over a
    // 60-key toy group is legitimately noisy
    assert(streamed("b") === 7.0)
    assert(streamed("a") > K.toDouble && streamed("c") > K.toDouble,
      "over-k groups must leave the exact branch")
  }

  test("restart with a smaller k re-trims restored state to the new bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kmv-ckpt").toString
    val input = MemoryStream[KeyEvent]
    // foreachBatch, not the memory sink: only foreachBatch supports
    // recovering a restarted query from the same checkpoint
    val latest = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    def runBatch(k: Int, data: Seq[KeyEvent]): Unit = {
      val q = SketchStream(input.toDS(), k)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[SketchStream.GroupEstimate], _: Long) =>
          b.collect().foreach(e => latest.put(e.group, e.kmv_distinct))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try { input.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    // checkpoint a 32-hash state, then resume the SAME checkpoint at k=8:
    // the fold must re-impose the new bound on restore, or the state
    // stays O(old k) per group for the stream's lifetime
    runBatch(32, (0 until 300).map(i => KeyEvent("g", i.toLong)))
    runBatch(8, (300 until 320).map(i => KeyEvent("g", i.toLong)))

    // the k smallest of the union survive either way, so the ESTIMATE
    // cannot expose an unbounded state — read the checkpoint itself
    val stateSizes = spark.read.format("statestore").load(ckpt)
      .select(size(col("value.groupState.hashes"))).as[Int].collect()
    assert(stateSizes.nonEmpty && stateSizes.forall(_ <= 8),
      s"state restored from a larger-k checkpoint must be re-trimmed: $stateSizes")

    // and the resumed stream still lands on the batch twin exactly
    val streamed = Map("g" -> latest.get("g"))
    import graft.functions.expressions.SketchAggregates.boundedMinK
    val batch = (0 until 320).map(i => ("g", i.toLong)).toDF("group", "key")
      .select(col("group"),
        xxhash64(col("key")).bitwiseXOR(lit(Long.MinValue)).as("u"))
      .distinct()
      .groupBy(col("group"))
      .agg(boundedMinK(col("u"), 8).as("us"))
      .collect()
      .map(r => r.getString(0) ->
        graft.operators.Sketches.kmvEstimate(r.getSeq[Long](1).toArray, 8))
      .toMap
    assert(streamed == batch,
      s"resumed stream diverged from the batch twin: $streamed vs $batch")
  }
}
