package graft.model

import org.apache.spark.sql.types._

/** Canonical storage schemas for the explorer engine.
  *
  * Mirrors the reference data model (reference: `etl/models/models.go:31-75`,
  * DDL `migrations/migrations.go:17-50`) re-expressed as Spark `StructType`s
  * over pulse-partitioned columnar storage. At 100 TB scale each table is a
  * parquet/Delta-style directory partitioned by `pulse_number` (the unit of
  * arrival, completion and reload), so partition pruning turns every
  * pulse-range predicate into a directory listing instead of a scan.
  */
object Schemas {

  /** `pulses` — ~10s ledger time slots; a doubly-linked time series.
    * reference: `etl/models/models.go:66-75`. Small dimension (1 row / 10s
    * ≈ 3M rows/year) — always broadcast-joinable.
    */
  val pulses: StructType = StructType(Seq(
    StructField("pulse_number", LongType, nullable = false),
    StructField("prev_pulse_number", LongType, nullable = false),
    StructField("next_pulse_number", LongType, nullable = false),
    StructField("is_complete", BooleanType, nullable = false),
    StructField("is_sequential", BooleanType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("jet_drop_amount", LongType, nullable = false),
    StructField("record_amount", LongType, nullable = false)
  ))

  /** `jet_drops` — per-(pulse, jet) blocks; `jet_id` is a binary-tree bit
    * prefix string (root = ""). reference: `etl/models/models.go:46-55`.
    */
  val jetDrops: StructType = StructType(Seq(
    StructField("pulse_number", LongType, nullable = false),
    StructField("jet_id", StringType, nullable = false),
    StructField("first_prev_hash", BinaryType),
    StructField("second_prev_hash", BinaryType),
    StructField("hash", BinaryType),
    StructField("raw_data", BinaryType),
    StructField("timestamp", LongType, nullable = false),
    StructField("record_amount", IntegerType, nullable = false)
  ))

  /** `records` — the fact table. PK `reference`; `(pulse_number, order)` is
    * the global sort key. reference: `etl/models/models.go:31-44`.
    */
  val records: StructType = StructType(Seq(
    StructField("reference", BinaryType, nullable = false),
    StructField("type", StringType, nullable = false), // state|request|result
    StructField("object_reference", BinaryType),
    StructField("prototype_reference", BinaryType),
    StructField("payload", BinaryType),
    StructField("prev_record_reference", BinaryType),
    StructField("hash", BinaryType),
    StructField("raw_data", BinaryType),
    StructField("jet_id", StringType, nullable = false),
    StructField("pulse_number", LongType, nullable = false),
    StructField("order", IntegerType, nullable = false),
    StructField("timestamp", LongType, nullable = false)
  ))

  /** Wire-level input record (pre-canonicalization), mirroring
    * `exporter.Record` as consumed at `etl/transformer/transformer.go:207-292`.
    */
  val wireRecords: StructType = StructType(Seq(
    StructField("record_number", LongType, nullable = false),
    StructField("id", BinaryType, nullable = false),
    StructField("object_id", BinaryType),
    StructField("jet_id", StringType, nullable = false),
    StructField("virtual_type", StringType, nullable = false),
    StructField("image", BinaryType),
    StructField("memory", BinaryType),
    StructField("prev_state_id", BinaryType),
    StructField("raw_data", BinaryType),
    StructField("pulse_number", LongType, nullable = false)
  ))
}

/** Typed row for the chain-sort stage (reference:
  * `etl/types/types.go:19-81`). Kept minimal: only the fields the
  * per-object topological sort needs, so the shuffled payload stays small.
  */
final case class ChainRecord(
    ref: Array[Byte],
    objectRef: Array[Byte],
    prevRef: Array[Byte],
    recType: String,
    orderHint: Long
)

/** Canonical record produced by ingest canonicalization (P1). */
final case class CanonicalRecord(
    reference: Array[Byte],
    recType: String,
    objectReference: Array[Byte],
    prototypeReference: Array[Byte],
    payload: Array[Byte],
    prevRecordReference: Array[Byte],
    hash: Array[Byte],
    rawData: Array[Byte],
    jetId: String,
    pulseNumber: Long,
    orderHint: Long,
    timestamp: Long
)
