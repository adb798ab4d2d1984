package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable predicate builders (SURVEY §2.2).
  *
  * All are plain `Column` boolean expressions, assembled conditionally like
  * the reference's dynamic WHERE builders (`etl/storage/storage.go:165-218`)
  * — Catalyst pushes every one of them down to the parquet scan, and range
  * predicates on the partition column prune whole partitions.
  */
object Predicates {

  /** P4 — optional range bounds on a numeric/timestamp column. Any side may
    * be None; gt/gte and lt/lte variants. storage.go:165-218.
    */
  def range(
      c: Column,
      gte: Option[Any] = None,
      lte: Option[Any] = None,
      gt: Option[Any] = None,
      lt: Option[Any] = None
  ): Column = {
    val conds = Seq(
      gte.map(v => c >= lit(v)),
      lte.map(v => c <= lit(v)),
      gt.map(v => c > lit(v)),
      lt.map(v => c < lit(v))
    ).flatten
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** P5 — keyset ("from_index") cursor over a two-part sort key.
    * Ascending:  (k1 > P) OR (k1 = P AND k2 >= O)
    * Descending: (k1 < P) OR (k1 = P AND k2 <= O)
    * reference: `etl/storage/storage.go:195-208`.
    * At scale this beats OFFSET pagination: the k1 bound prunes partitions
    * and row groups; OFFSET always scans from the start.
    */
  def keysetFrom(k1: Column, k2: Column, p: Long, o: Long, asc: Boolean): Column =
    if (asc) (k1 > p) || (k1 === p && k2 >= o)
    else (k1 < p) || (k1 === p && k2 <= o)

  /** Apply all provided filters in one pass (None = no-op). */
  def applyAll(df: DataFrame, preds: Seq[Option[Column]]): DataFrame =
    preds.flatten.foldLeft(df)(_ filter _)
}
