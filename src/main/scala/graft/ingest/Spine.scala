package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ChainSort

/** The full write-path spine (SURVEY §3.1): wire records → canonical rows
  * → per-object chain sort → deterministic order assignment. One shuffle
  * on the chain-group key, one window over (pulse, jet); everything else
  * is codegen'd projection.
  */
object Spine {

  /** Transform a frame of wire records (Schemas.wireRecords shape) into
    * storage-ready records with the causal `order` column. Broken chain
    * groups are dropped whole (reference semantics,
    * `etl/transformer/transformer.go:59-63`).
    */
  def apply(wire: DataFrame): DataFrame = {
    val canon = Canonicalize(wire)
    val nodes = canon.select(
      hex(col("reference")).as("key"),
      concat_ws("|", col("pulse_number"), col("jet_id"),
        hex(coalesce(col("object_reference"), lit(Array.emptyByteArray)))).as("group_key"),
      hex(coalesce(col("prev_record_reference"), lit(Array.emptyByteArray))).as("prev_key"),
      (col("type") === "state").as("chained"),
      col("order_hint").cast("long").as("order_hint"))
    val sorted = ChainSort.sortDf(nodes).withColumnRenamed("key", "ref_hex")
    val withPos = canon
      .join(sorted, hex(col("reference")) === col("ref_hex"))
      .drop("ref_hex", "group_key")
    PulseWriter.assignOrder(withPos).drop("chain_pos")
  }
}
