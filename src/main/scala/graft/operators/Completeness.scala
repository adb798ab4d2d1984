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
    * the chain is complete (pulsemaintainer.go:86-143). Computed as a
    * running conjunction over the pulse order — a single window over the
    * small status frame.
    */
  def withSequential(status: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("pulse_number")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    status.withColumn("is_sequential",
      min(col("is_complete").cast("int")).over(w) === 1)
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
