package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.JetFunctions

/** ST2 as a stateful stream: the reference's in-memory pulse→jets register
  * (`etl/controller/controller.go:124-132`, `pulsemaintainer.go:30-83`)
  * re-expressed as `flatMapGroupsWithState` keyed by pulse. Each incoming
  * jet-drop event folds into the per-pulse jet set; an updated completeness
  * verdict is emitted per batch, flipping to complete exactly when the jet
  * ids form a full binary-tree cover.
  *
  * State is bounded: one small Set[String] per open pulse, and a pulse's
  * state can be timed out once sealed (the reference's TTL analog).
  */
object CompletenessStream {

  final case class DropEvent(pulse_number: Long, jet_id: String)
  final case class PulseJets(jets: Set[String])
  final case class PulseStatus(pulse_number: Long, jet_count: Int, is_complete: Boolean)

  def apply(drops: Dataset[DropEvent]): Dataset[PulseStatus] = {
    import drops.sparkSession.implicits._
    drops
      .groupByKey(_.pulse_number)
      .flatMapGroupsWithState[PulseJets, PulseStatus](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (pulse: Long, events: Iterator[DropEvent], state: GroupState[PulseJets]) =>
          val jets = state.getOption.map(_.jets).getOrElse(Set.empty[String]) ++
            events.map(_.jet_id)
          state.update(PulseJets(jets))
          Iterator.single(PulseStatus(pulse, jets.size, JetFunctions.jetTreeCover(jets)))
      }
  }
}
