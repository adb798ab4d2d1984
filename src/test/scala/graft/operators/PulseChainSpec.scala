package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PulseChainSpec extends SparkSpec {

  // pulses 10,11,13 (12 missing); stored prev follows the +1 ledger contract
  private def pulses = {
    import spark.implicits._
    Seq((10L, 9L), (11L, 10L), (13L, 12L)).toDF("pulse_number", "prev_pulse_number")
  }

  test("repairChain marks gap edges with -1 sentinels") {
    val out = PulseChain.repairChain(pulses).orderBy("pulse_number")
      .select("pulse_number", "prev_pulse_number", "next_pulse_number")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (10L, -1L, 11L),  // page start: prev unknown; 11 follows
      (11L, 10L, -1L),  // 12 missing: next broken
      (13L, -1L, -1L))) // prev (12) missing; page end
  }

  test("repairChain honors stored prev disagreement (chain break)") {
    import spark.implicits._
    // 21's stored prev says 19 — even though 20 is adjacent, the link is broken
    val df = Seq((20L, 19L), (21L, 19L)).toDF("pulse_number", "prev_pulse_number")
    val out = PulseChain.repairChain(df).orderBy("pulse_number")
      .select("prev_pulse_number", "next_pulse_number")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((-1L, -1L), (-1L, -1L)))
  }

  test("repairByAdjacency matches the window repair on a contract-following chain") {
    val byWindow = PulseChain.repairChain(pulses).orderBy("pulse_number")
      .select("pulse_number", "prev_pulse_number", "next_pulse_number").collect().toSeq
    val byJoin = PulseChain.repairByAdjacency(pulses, pulses).orderBy("pulse_number")
      .select("pulse_number", "prev_pulse_number", "next_pulse_number").collect().toSeq
    assert(byJoin == byWindow)
  }

  test("repairByAdjacency is exact for a page cut (probes run against the full dimension)") {
    // cut a one-row "page" out of the middle: the full-table repair gives
    // (11 -> prev 10, next -1); a window over the page alone could not
    // see pulse 10 at all
    val page = pulses.filter(col("pulse_number") === 11L)
    val out = PulseChain.repairByAdjacency(page, pulses)
      .select("prev_pulse_number", "next_pulse_number")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((10L, -1L)))
  }

  test("point lookups: nextPulse and aggregates") {
    import spark.implicits._
    val df = Seq((10L, 9L, true), (11L, 10L, true), (13L, 12L, false))
      .toDF("pulse_number", "prev_pulse_number", "is_sequential")
    assert(PulseChain.nextPulse(df, 10L) == 11L)
    assert(PulseChain.nextPulse(df, 99L) == -1L)
    assert(PulseChain.maxSequentialPulse(df).contains(11L))
    assert(PulseChain.nextSavedPulse(df, 11L).contains(13L))
    assert(PulseChain.nextSavedPulse(df, 13L).isEmpty)
  }
}
