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

  // (The record-row analog of this mapper, `RecordToAPI` at
  // `api/mappers.go:19-55`, is implemented where it is actually served:
  // HttpApi.withIndex + JsonOut render the live record presentation for
  // both the corpus and the store serving schemas — a parallel
  // DataFrame-shaped mapper here matched neither schema and had no
  // production caller, so it was removed rather than left to drift.)

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

}
