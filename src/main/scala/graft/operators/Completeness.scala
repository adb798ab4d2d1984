package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.JetFunctions

/** ST2/ST3 — completeness & sequence tracking, re-expressed for an
  * immutable columnar store.
  *
  * The reference mutates `is_complete`/`is_sequential` booleans in Postgres
  * from an in-memory register (`etl/controller/pulsemaintainer.go:30-143`).
  * Here both flags are DERIVED: a small status frame recomputed per batch
  * from the jet_drops table — no record partitions are ever rewritten.
  * The status table is pulses-sized (tiny), so the final window pass is
  * cheap; the only big-data stage is the `groupBy(pulse).collect_set(jet)`
  * which is a map-side-combining aggregation over the drops table, pruned
  * to the open (incomplete) pulse range by the caller.
  */
object Completeness {

  /** Per-pulse completeness: the set of jet ids forms a full binary-tree
    * cover (`pulseIsComplete`, pulsemaintainer.go:145-212).
    */
  def pulseCompleteness(jetDrops: DataFrame): DataFrame = {
    val cover = udaf(JetCoverAggregator, org.apache.spark.sql.Encoders.STRING)
    jetDrops
      .groupBy(col("pulse_number"))
      .agg(cover(col("jet_id")).as("is_complete"))
  }

  /** Sequence flag: a pulse is sequential iff it and every predecessor in
    * the chain is complete (pulsemaintainer.go:86-143). The running
    * conjunction over pulse order collapses to a scalar: a pulse is
    * sequential iff it precedes the FIRST incomplete pulse. Computed as a
    * 1-row aggregate broadcast-joined back — fully parallel, no
    * unpartitioned window, so the spine build stays shuffle-shaped even
    * when the pulse dimension has grown for years.
    */
  def withSequential(status: DataFrame): DataFrame = {
    val firstIncomplete = status.filter(!col("is_complete"))
      .agg(min(col("pulse_number")).as("_first_incomplete"))
    status.crossJoin(broadcast(firstIncomplete))
      .withColumn("is_sequential",
        col("_first_incomplete").isNull ||
          col("pulse_number") < col("_first_incomplete"))
      .drop("_first_incomplete")
  }

  /** ST3 — gap detection: expected pulse numbers minus present ones.
    * The reference re-requests `(from, to]` on a gap
    * (`etl/controller/pulsemaintainer.go:214-227`). Expressed as an
    * anti-join of the dense expected range against the observed set; with
    * pulse-partitioned storage the observed side is just partition metadata.
    */
  def missingInRange(present: DataFrame, keyCol: String, from: Long, to: Long, step: Long = 1L): DataFrame = {
    val spark = present.sparkSession
    val expected = spark.range(from, to + 1, step).toDF(keyCol)
    expected.join(present.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
  }
}
