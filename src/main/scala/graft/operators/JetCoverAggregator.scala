package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.functions.JetFunctions

/** ST2 completeness as a typed Aggregator: partial aggregation unions
  * per-partition jet sets map-side, so only small sets shuffle — the
  * proper distributed form of `collect_set + UDF` (which ships every jet
  * id to the reducer). Used via `functions.udaf` on a jet_id column
  * grouped by pulse.
  */
object JetCoverAggregator extends Aggregator[String, Set[String], Boolean] {
  override def zero: Set[String] = Set.empty
  override def reduce(acc: Set[String], jetId: String): Set[String] = acc + jetId
  override def merge(a: Set[String], b: Set[String]): Set[String] = a ++ b
  override def finish(jets: Set[String]): Boolean = JetFunctions.jetTreeCover(jets)
  override def bufferEncoder: Encoder[Set[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Set[String]]()
  override def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
}
