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
}
