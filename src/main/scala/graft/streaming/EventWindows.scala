package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the standard
  * Structured Streaming shape for the event stream (the explorer domain
  * itself needs none: the pulse IS the window — SURVEY §2.6 — but the
  * training-pipeline side aggregates arbitrary event streams).
  *
  * Input may carry `ts` as TIMESTAMP or as raw nanos (the testdata's
  * TIMESTAMP_NANOS read under `nanosAsLong`); both normalize to a
  * timestamp column before watermarking. Late rows beyond the watermark
  * are dropped by the engine; closed windows emit exactly once in append
  * mode.
  */
object EventWindows {

  /** `ts` normalized to an `event_time` timestamp: LongType is the
    * testdata's TIMESTAMP_NANOS under `nanosAsLong` (→ micros), anything
    * else passes through. ONE implementation for both entry points so
    * the unit heuristic cannot drift between them.
    */
  private def withEventTime(events: DataFrame): DataFrame =
    if (events.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      events.withColumn("event_time",
        timestamp_micros(expr("CAST(ts DIV 1000 AS BIGINT)")))
    else events.withColumn("event_time", col("ts"))

  /** Tumbling per-type counts: watermark `lateness`, window `size`. */
  def typeCounts(
      events: DataFrame,
      size: String = "1 hour",
      lateness: String = "30 minutes"
  ): DataFrame = {
    withEventTime(events)
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), size), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming exact dedup: first occurrence per key within the watermark
    * horizon (state expires with the watermark — bounded memory at scale).
    */
  def dedupStream(events: DataFrame, keyCol: String, lateness: String = "30 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark(keyCol)
}
