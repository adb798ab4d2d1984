package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Codecs

/** API presentation mappers (reference: `api/mappers.go:19-95`):
  * binary columns rendered base64 (F6), composite ids as strings
  * (F3/F4), empty refs normalized to null (F8/P2), and the `{total,
  * result}` page envelope every list endpoint returns.
  * All pure column algebra — the mapping is part of the query plan, not a
  * driver-side loop.
  */
object Mappers {

  /** Record row → API shape (`api/mappers.go:19-55`); `total` passes
    * through when the caller paged with [[graft.operators.Pagination.pageWithTotal]].
    */
  def recordToApi(records: DataFrame): DataFrame =
    records.select((Seq(
      base64(Codecs.emptyRefToNull(col("reference"))).as("reference"),
      col("type"),
      base64(Codecs.emptyRefToNull(col("object_reference"))).as("object_reference"),
      base64(Codecs.emptyRefToNull(col("prototype_reference"))).as("prototype_reference"),
      base64(col("payload")).as("payload"),
      base64(Codecs.emptyRefToNull(col("prev_record_reference"))).as("prev_record_reference"),
      base64(col("hash")).as("hash"),
      col("jet_id"),
      col("pulse_number"),
      col("order"),
      Codecs.indexString(col("pulse_number"), col("order")).as("index"),
      col("timestamp")) ++
      Seq("total", graft.operators.Pagination.PageRowMarker)
        .filter(records.columns.contains).map(col)): _*)

  /** Jet drop row → API shape (`api/mappers.go:57-76`); the J5 link-list
    * and `total` columns pass through when the caller enriched them.
    */
  def jetDropToApi(drops: DataFrame): DataFrame = {
    val links = Seq("prev_ids", "next_ids", "prev_jet_drop_id", "next_jet_drop_id",
      "total", graft.operators.Pagination.PageRowMarker)
      .filter(drops.columns.contains).map(col)
    drops.select(Seq(
      Codecs.jetDropIdString(col("jet_id"), col("pulse_number")).as("jet_drop_id"),
      col("jet_id"),
      col("pulse_number"),
      base64(col("hash")).as("hash"),
      col("record_amount"),
      col("timestamp")) ++ links: _*)
  }

  /** Wrap a bounded page in the `{total, result}` envelope the API
    * returns (`api/handlers.go:637-645`). The page is driver-sized by
    * validation (≤1000 rows), so the collect here is the API boundary,
    * not a distributed operation.
    */
  def envelope(page: DataFrame, total: Long): (Long, Array[org.apache.spark.sql.Row]) =
    (total, page.collect())
}
