package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** List-endpoint pagination (W5, A3).
  *
  * The reference runs `LIMIT/OFFSET` plus a separate `COUNT(*)` over the same
  * filters for every list endpoint (`etl/storage/storage.go:229-255`). Two
  * idioms here:
  *
  *  - `page`: sort + offset + limit (Spark `offset` is a logical operator
  *    since 3.4; with a unique total order the page is deterministic).
  *  - `pageWithTotal`: one-pass variant that attaches `total` via an
  *    unpartitioned `count(*) OVER ()` window. On a 100 TB fact table an
  *    unpartitioned window would funnel everything to one task — but list
  *    pages are bounded at 1000 rows by validation (P7), and the window runs
  *    AFTER the pushed-down filters, on the filtered (small) set for every
  *    real endpoint. For unfiltered counts prefer `df.count()` (two scans,
  *    both parallel).
  */
object Pagination {

  val DefaultLimit = 20
  val MaxLimit = 1000

  /** P7 — clamp/validate limit & offset like `api/handlers.go:678-703`. */
  def validLimit(l: Int): Boolean = l >= 1 && l <= MaxLimit
  def validOffset(o: Int): Boolean = o >= 0

  /** W5 — deterministic page: sort keys must form a total order. */
  def page(df: DataFrame, sort: Seq[Column], limit: Int, offset: Int = 0): DataFrame = {
    val sorted = df.orderBy(sort: _*)
    (if (offset > 0) sorted.offset(offset) else sorted).limit(limit)
  }

  /** A3 — page plus total count of the filtered set in one logical plan. */
  def pageWithTotal(df: DataFrame, sort: Seq[Column], limit: Int, offset: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withTotal = df.withColumn("total", count(lit(1)).over(Window.partitionBy()))
    val sorted = withTotal.orderBy(sort: _*)
    (if (offset > 0) sorted.offset(offset) else sorted).limit(limit)
  }
}
