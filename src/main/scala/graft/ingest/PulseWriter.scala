package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S3/S4/ST4/W7 — idempotent per-pulse commit.
  *
  * The reference upserts rows transactionally into Postgres
  * (`etl/storage/storage.go:28-94`); at-least-once delivery plus
  * ON CONFLICT gives effective exactly-once. On an immutable columnar store
  * the same guarantee comes from DETERMINISTIC PARTITION OVERWRITE: a pulse
  * is the commit unit, `pulse_number=N` is a directory, and rewriting it is
  * atomic-enough (dynamic partition overwrite) and idempotent — a retried or
  * re-delivered pulse produces byte-identical partitions because `order`
  * assignment (W7) sorts before numbering.
  *
  * At 100 TB this is also the right physical layout: pulse-range predicates
  * prune partitions; within a partition files are sorted by
  * (jet_id, order) so min/max row-group stats make jet and keyset
  * predicates skip row groups.
  */
object PulseWriter {

  /** W7 — deterministic order assignment: position of each record within
    * its (pulse, jet) drop, numbered along the chain-sorted position.
    * Sorting before `row_number` makes retries idempotent (ST4).
    */
  def assignOrder(records: DataFrame, posCol: String = "chain_pos"): DataFrame = {
    val w = Window.partitionBy(col("pulse_number"), col("jet_id"))
      .orderBy(col(posCol), col("reference"))
    records.withColumn("order", row_number().over(w))
  }

  /** Write one pulse's records/jet_drops as an overwrite of exactly the
    * `pulse_number=N` partitions present in `df` (dynamic mode), sorted for
    * row-group locality.
    */
  def writePulsePartition(df: DataFrame, table: String, basePath: String): Unit = {
    df.sortWithinPartitions(col("jet_id"))
      .write
      .mode(SaveMode.Overwrite)
      // per-writer dynamic mode (never spark.conf.set — a session-global
      // flip would change every later partitioned overwrite's semantics,
      // including the migration staging write that relies on STATIC
      // commit ordering for its _SUCCESS marker)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pulse_number")
      .parquet(s"$basePath/$table")
  }

  /** The shared two-table pulse commit — ONE implementation for the
    * batch [[Pipeline]] and the [[graft.Ingest]] daemon, so the spine →
    * records → jet_drops contract cannot diverge between the two entry
    * points. Returns the pulse's drop rows (jets-sized — one row per
    * (pulse, jet)) so daemon-side registers come for free from the
    * commit itself, like the reference's processor populating the
    * controller's `jetDropRegister`.
    */
  def commitPulse(wire: DataFrame, basePath: String,
      collectDrops: Boolean = true): Array[org.apache.spark.sql.Row] = {
    val records = Spine(wire).cache()
    try {
      writePulsePartition(records, "records", basePath)
      val drops = records.groupBy(col("pulse_number"), col("jet_id"))
        .agg(count(lit(1)).cast("int").as("record_amount"),
          min(col("timestamp")).as("timestamp"))
      writePulsePartition(drops, "jet_drops", basePath)
      // callers without a register (the batch Pipeline) skip the collect
      if (collectDrops) drops.collect() else Array.empty
    } finally { records.unpersist(); () }
  }

  /** S4 — pulse-row upsert as last-write-wins dedup: keep the newest row
    * per pulse_number by `ingest_ts`.
    */
  def upsertPulses(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val all = existing.unionByName(incoming, allowMissingColumns = true)
    val w = Window.partitionBy(col("pulse_number")).orderBy(col("ingest_ts").desc)
    all.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}
