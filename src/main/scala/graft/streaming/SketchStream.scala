package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming cardinality monitoring: the KMV distinct sketch as
  * per-group `mapGroupsWithState` — live distinct-count estimates over an
  * unbounded key stream (drift detection on ingest: a corpus whose
  * per-source user/document cardinality jumps is worth an alert long
  * before a batch job would notice).
  *
  * The state is the sketch itself — the ≤ k smallest distinct
  * sign-flipped xxhash64 values seen so far — so state size is O(k) per
  * group forever, and folding a batch into it is exactly the batch
  * aggregate's merge ([[graft.operators.Sketches]]): after ANY
  * batch/stream split of the same events, the final estimate is
  * identical to the batch sketch's (asserted in SketchStreamSpec).
  */
object SketchStream {

  final case class KeyEvent(group: String, key: Long)
  final case class KmvState(hashes: Array[Long])
  final case class GroupEstimate(group: String, kmv_distinct: Double)

  def apply(events: Dataset[KeyEvent], k: Int): Dataset[GroupEstimate] = {
    // mirror the batch twin's guard (Sketches.eventSketch): k <= 0 would
    // NoSuchElementException on set.last inside an executor's state
    // function, and k == 1 silently estimates 0.0 for every group (the
    // (k-1) numerator) — fail at the entry point, not mid-stream
    require(k >= 2, s"KMV sketch needs k >= 2, got $k")
    import events.sparkSession.implicits._
    events
      .select(col("group"),
        xxhash64(col("key")).bitwiseXOR(lit(Long.MinValue)).as("u"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[KmvState, GroupEstimate](GroupStateTimeout.NoTimeout()) {
        (g, rows, state) =>
          // fold the batch iterator incrementally into a bounded ordered
          // set: per-trigger memory stays O(k) even for a hot group
          // (materializing the whole batch before distinct/sort/take
          // would be O(batch rows))
          val set = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.hashes.foreach(set.add(_)))
          // restored state can exceed the current k (checkpoint written
          // with a larger k): re-trim so the O(k) bound holds from the
          // first trigger, not just for freshly-created groups
          while (set.size > k) set.pollLast()
          rows.foreach { r =>
            val u = r._2
            if (set.size < k) set.add(u)
            else if (u < set.last && set.add(u)) set.pollLast()
          }
          val merged = new Array[Long](set.size)
          val it = set.iterator(); var i = 0
          while (it.hasNext) { merged(i) = it.next(); i += 1 }
          state.update(KmvState(merged))
          GroupEstimate(g, graft.operators.Sketches.kmvEstimate(merged, k))
      }
  }
}
