package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pulse-chain operators (J2, J3, W6, A4).
  *
  * The pulses table is a doubly-linked time series; the reference never
  * trusts the stored prev/next pointers on reads — it recomputes them per
  * page (`etl/storage/storage.go:326-379`), with `-1` as the "unknown"
  * sentinel. In Spark this is pure `lag`/`lead` window algebra.
  *
  * Scale note: [[repairChain]]'s `Window.orderBy` without partitioning is
  * a single-task sort, so the serving paths never hand it the full
  * dimension: the API pages first and repairs within the ≤1000-row page
  * (reference per-page loop), and full-dump/catalog reads use
  * [[repairByAdjacency]] — two parallel equi-joins, exact under the
  * hourly write contract. The general window form remains for inputs
  * whose stored pointers may deviate (fixture chains, foreign imports).
  */
object PulseChain {

  val Unknown: Long = -1L

  /** J3/W6 — recompute prev/next pointers pairwise within an ordered set of
    * pulses: neighbor pointers only count when the stored `prev_pulse_number`
    * actually matches the adjacent pulse; otherwise the chain is broken and
    * the pointer is `-1`. Page ends are `-1` (the reference patches them with
    * point lookups J2, which callers can do against the full table).
    * Mirrors `etl/storage/storage.go:326-356`.
    */
  def repairChain(
      pulses: DataFrame,
      pulseCol: String = "pulse_number",
      prevCol: String = "prev_pulse_number"
  ): DataFrame = {
    val w = Window.orderBy(col(pulseCol))
    pulses
      .withColumn("_lag", lag(col(pulseCol), 1).over(w))
      .withColumn("_lead", lead(col(pulseCol), 1).over(w))
      .withColumn("_lead_prev", lead(col(prevCol), 1).over(w))
      // prev link holds iff my stored prev equals the actual predecessor
      .withColumn("prev_pulse_number",
        when(col("_lag").isNotNull && col(prevCol) === col("_lag"), col("_lag"))
          .otherwise(lit(Unknown)))
      // next link holds iff the successor's stored prev points to me
      .withColumn("next_pulse_number",
        when(col("_lead").isNotNull && col("_lead_prev") === col(pulseCol), col("_lead"))
          .otherwise(lit(Unknown)))
      .drop("_lag", "_lead", "_lead_prev")
  }

  /** J3 repair specialized to the ledger WRITE CONTRACT: every stored
    * `prev_pulse_number` is `pulse - 1` (what [[graft.model.Domain.pulses]]
    * and the ingest writer emit — the hourly cadence has no variable
    * spacing). Under that invariant the window algebra of [[repairChain]]
    * collapses to an existence probe of the adjacent pulse in the full
    * dimension: `prev = p-1` iff a row at `p-1` exists, `next = p+1` iff a
    * row at `p+1` exists. That makes repair two equi-joins — fully
    * parallel, no global sort — and it is exact for ANY subset `rows` of
    * `all` (page-cut-then-repair, the reference's per-page loop,
    * `etl/storage/storage.go:326-356`, with the edge patch built in
    * because the probe runs against the whole dimension). Callers whose
    * stored pointers may deviate from the contract must use
    * [[repairChain]] instead.
    */
  def repairByAdjacency(
      rows: DataFrame,
      all: DataFrame,
      pulseCol: String = "pulse_number",
      prevCol: String = "prev_pulse_number"
  ): DataFrame = {
    val hasPrev = all.select((col(pulseCol) + 1).as("_adj_prev_of"))
    val hasNext = all.select((col(pulseCol) - 1).as("_adj_next_of"))
    rows
      .join(hasPrev, col(pulseCol) === col("_adj_prev_of"), "left")
      .join(hasNext, col(pulseCol) === col("_adj_next_of"), "left")
      .withColumn("prev_pulse_number",
        when(col("_adj_prev_of").isNotNull && col(prevCol) === col(pulseCol) - 1,
          col(pulseCol) - 1).otherwise(lit(Unknown)))
      .withColumn("next_pulse_number",
        when(col("_adj_next_of").isNotNull, col(pulseCol) + 1).otherwise(lit(Unknown)))
      .drop("_adj_prev_of", "_adj_next_of")
  }

  /** J2 — point lookups: the pulse after P is the row whose stored prev = P;
    * the pulse before P is the row at P's stored prev. Misses → -1.
    * reference: `etl/storage/storage.go:360-379`.
    */
  def nextPulse(pulses: DataFrame, p: Long): Long =
    pulses.filter(col("prev_pulse_number") === p)
      .select(min("pulse_number")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(Unknown)

  /** A4 — greatest sequential pulse / first pulse after X.
    * reference: `etl/storage/storage.go:430-463`.
    */
  def maxSequentialPulse(pulses: DataFrame): Option[Long] =
    pulses.filter(col("is_sequential"))
      .agg(max("pulse_number")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))

  def nextSavedPulse(pulses: DataFrame, after: Long): Option[Long] =
    pulses.filter(col("pulse_number") > after)
      .agg(min("pulse_number")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
}
