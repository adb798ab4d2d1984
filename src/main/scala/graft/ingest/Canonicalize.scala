package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Codecs

/** P1/P2/F9 — wire-record canonicalization.
  *
  * The reference switches on the protobuf `Virtual` union
  * (`etl/transformer/transformer.go:207-292`): activate/amend/deactivate →
  * "state", incoming/outgoing request → "request", result → "result";
  * unsupported union members are DROPPED. Genesis-pulse records
  * (pulse == MinTimePulse) get their object reference rewritten from the
  * record id. All of it is `when/otherwise` column algebra — one codegen'd
  * projection, no UDFs, fully pushdown-friendly.
  */
object Canonicalize {

  /** Insolar MinTimePulse — first non-genesis pulse number. */
  val MinTimePulse = 65536L

  private val StateTypes = Seq("activate", "amend", "deactivate")
  private val RequestTypes = Seq("incoming_request", "outgoing_request")

  /** F9 — wire union tag → canonical record type; null for unsupported. */
  def recordType(virtualType: Column): Column =
    when(virtualType.isin(StateTypes: _*), lit("state"))
      .when(virtualType.isin(RequestTypes: _*), lit("request"))
      .when(virtualType === "result", lit("result"))
      .otherwise(lit(null).cast("string"))

  /** Full canonicalization of a wire-record frame (Schemas.wireRecords
    * shape) into canonical records. Drops unsupported types (P1),
    * normalizes empty refs to null (P2).
    */
  def apply(wire: DataFrame): DataFrame =
    wire
      .withColumn("type", recordType(col("virtual_type")))
      .filter(col("type").isNotNull) // unsupported union members dropped
      .select(
        col("id").as("reference"),
        col("type"),
        // genesis special case: object ref falls back to the record id
        when(col("pulse_number") === MinTimePulse, col("id"))
          .otherwise(Codecs.emptyRefToNull(col("object_id"))).as("object_reference"),
        when(col("virtual_type").isin("activate", "amend"),
          Codecs.emptyRefToNull(col("image")))
          .otherwise(lit(null).cast("binary")).as("prototype_reference"),
        when(col("virtual_type").isin("activate", "amend", "result"), col("memory"))
          .otherwise(lit(null).cast("binary")).as("payload"),
        when(col("virtual_type").isin("amend", "deactivate"),
          Codecs.emptyRefToNull(col("prev_state_id")))
          .otherwise(lit(null).cast("binary")).as("prev_record_reference"),
        // unhex, NOT cast: sha2 returns the ASCII-HEX string, and casting
        // that to binary stores the 64 hex characters' UTF-8 bytes — the
        // served base64 would then be base64-of-hex, not the reference's
        // base64 of the 32-byte digest, and the column doubles in size
        unhex(sha2(coalesce(col("raw_data"), lit(Array.emptyByteArray)), 256))
          .as("hash"),
        col("raw_data"),
        col("jet_id"),
        col("pulse_number"),
        col("record_number").as("order_hint"),
        // pulse numbers encode time (reference: `transformer.go:161-170`,
        // `testutils/models.go:76-89`): genesis epoch + elapsed seconds
        (col("pulse_number") - lit(MinTimePulse)).as("timestamp")
      )
}
