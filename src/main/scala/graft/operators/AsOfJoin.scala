package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row whose time is at
  * or before the left row's time, per key. Spark has no native ASOF
  * operator; this composes built-ins (SURVEY §7.3 preference (a)):
  *
  *   union the two sides tagged, sort per key by (time, side), and
  *   carry the last right payload forward with `last(_, ignoreNulls)`
  *   over an unbounded-preceding window — one shuffle on the key, no
  *   range-join explosion, no per-row lookup.
  *
  * Right rows sort BEFORE left rows at equal times, so an exact-tie
  * right row is visible to the left row (ASOF `>=` semantics, matching
  * DuckDB's `ASOF LEFT JOIN`). Right times should be unique per key.
  */
object AsOfJoin {

  /** @param left       probe side (all its columns are preserved)
    * @param right      build side; `rightTime` and `rightCols` come back
    *                   prefixed `asof_`, null when no prior row exists
    * @param keyCols    equi-key columns present on both sides
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]
  ): DataFrame = {
    // reserved working columns (the same loud-guard discipline as
    // Pagination.pageWithTotalCarried): a left frame already carrying one
    // of these would silently corrupt the carry — its own `_r` values
    // would win last(_r) over the right payload, its `_t` would be
    // overwritten and returned under the original name
    Seq("_t", "_side", "_r").foreach(n =>
      require(!left.columns.contains(n),
        s"AsOfJoin reserves column name '$n'; rename it on the left frame"))
    val payload = (rightTime +: rightCols).map(col)
    // Join-equality semantics for NULLs (what a real ASOF join — and the
    // DuckDB oracle — produces): a NULL equi-key matches nothing, and a
    // NULL right time can never satisfy t_r <= t_l. The window would
    // otherwise group NULL keys into one partition (nulls DO compare
    // equal under partitionBy) and sort a NULL right time first, leaking
    // its payload into every left row before the first real right row.
    val rightMatchable = keyCols
      .map(col(_).isNotNull)
      .foldLeft(col(rightTime).isNotNull)(_ && _)
    val r = right.filter(rightMatchable).select(
      keyCols.map(col) :+ col(rightTime).as("_t") :+
        lit(0).as("_side") :+ struct(payload: _*).as("_r"): _*)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // `_r` as the final sort key makes the carried row deterministic when
    // several right rows share (key, time): the greatest payload struct
    // wins, independent of physical row order. Left rows carry null `_r`
    // and only ever tie among themselves, where order is irrelevant.
    // Skipped when the payload contains an unorderable type (e.g. a map
    // column) — sorting such a struct fails analysis, and those callers
    // keep the pre-tiebreaker behavior.
    val payloadOrderable = {
      val fields = right.schema
      (rightTime +: rightCols).forall { c =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(fields(c).dataType)
      }
    }
    val sortKeys = Seq(col("_t"), col("_side")) ++
      (if (payloadOrderable) Seq(col("_r")) else Nil)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
    val outCols = left.columns.map(col) ++
      (rightTime +: rightCols).map(c => col("_asof").getField(c).as(s"asof_$c"))
    carried.filter(col("_side") === 1).select(outCols: _*)
  }
}
