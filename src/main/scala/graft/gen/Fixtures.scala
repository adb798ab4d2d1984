package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scenario generators mirroring the reference's testutils
  * (reference: `testutils/generators.go`, `testutils/models.go`). All
  * shapes are seeded and built on the driver (scenario sizes are test-
  * sized by construction), then parallelized as DataFrames so the ingest
  * spine under test runs distributed.
  */
object Fixtures {

  /** pulseDelta of the reference domain (`testutils/models.go:16`). */
  val PulseDelta = 10L
  val GenesisPulse = 65536L

  private def ref(tag: String, pulse: Long, n: Long): Array[Byte] =
    f"$tag%s:$pulse%d:$n%d".getBytes("UTF-8")

  final case class WireRow(
      record_number: Long,
      id: Array[Byte],
      object_id: Array[Byte],
      jet_id: String,
      virtual_type: String,
      image: Array[Byte],
      memory: Array[Byte],
      prev_state_id: Array[Byte],
      raw_data: Array[Byte],
      pulse_number: Long)

  /** Scenario 1 — object lifeline (`testutils/generators.go:159-208`):
    * pulse 0 carries an incoming_request + activate; later pulses carry
    * chained amends (prev_state_id → previous state id); optional final
    * deactivate. Records are emitted in a seeded shuffled order within
    * each pulse so ingest MUST chain-sort to recover causality.
    */
  def lifelineWire(
      spark: SparkSession,
      objectTag: String,
      nPulses: Int,
      amendsPerPulse: Int = 2,
      deactivate: Boolean = true,
      jetId: String = "0",
      startPulse: Long = GenesisPulse + PulseDelta,
      seed: Long = 42L
  ): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val objectId = ref("obj-" + objectTag, startPulse, 0)
    var prevState: Array[Byte] = null
    var n = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[WireRow]
    for (p <- 0 until nPulses) {
      val pulse = startPulse + p * PulseDelta
      val perPulse = scala.collection.mutable.ArrayBuffer.empty[WireRow]
      if (p == 0) {
        val reqId = ref("req-" + objectTag, pulse, { n += 1; n })
        perPulse += WireRow(0, reqId, objectId, jetId, "incoming_request",
          null, null, null, ref("raw", pulse, n), pulse)
        val actId = ref("state-" + objectTag, pulse, { n += 1; n })
        perPulse += WireRow(0, actId, objectId, jetId, "activate",
          ref("img", pulse, n), ref("mem", pulse, n), null, ref("raw", pulse, n), pulse)
        prevState = actId
      } else {
        for (_ <- 0 until amendsPerPulse) {
          val amendId = ref("state-" + objectTag, pulse, { n += 1; n })
          perPulse += WireRow(0, amendId, objectId, jetId, "amend",
            ref("img", pulse, n), ref("mem", pulse, n), prevState, ref("raw", pulse, n), pulse)
          prevState = amendId
        }
        if (deactivate && p == nPulses - 1) {
          val deId = ref("state-" + objectTag, pulse, { n += 1; n })
          perPulse += WireRow(0, deId, objectId, jetId, "deactivate",
            null, null, prevState, ref("raw", pulse, n), pulse)
          prevState = deId
        }
      }
      // out-of-order arrival within the pulse (generators shuffle too)
      val shuffled = rnd.shuffle(perPulse.toSeq)
      rows ++= shuffled.zipWithIndex.map { case (r, i) => r.copy(record_number = i.toLong) }
    }
    spark.createDataset(rows.toSeq).toDF()
  }

  /** The by-construction causal state order of [[lifelineWire]] — what the
    * lifeline query must return (asc).
    */
  def lifelineExpectedStates(objectTag: String, nPulses: Int, amendsPerPulse: Int = 2,
      deactivate: Boolean = true, startPulse: Long = GenesisPulse + PulseDelta): Seq[String] = {
    var n = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (p <- 0 until nPulses) {
      val pulse = startPulse + p * PulseDelta
      if (p == 0) {
        n += 1 // request
        n += 1; out += new String(ref("state-" + objectTag, pulse, n), "UTF-8")
      } else {
        for (_ <- 0 until amendsPerPulse) {
          n += 1; out += new String(ref("state-" + objectTag, pulse, n), "UTF-8")
        }
        if (deactivate && p == nPulses - 1) {
          n += 1; out += new String(ref("state-" + objectTag, pulse, n), "UTF-8")
        }
      }
    }
    out.toSeq
  }

  final case class DropRow(
      pulse_number: Long,
      jet_id: String,
      hash: Array[Byte],
      first_prev_hash: Array[Byte],
      second_prev_hash: Array[Byte],
      record_amount: Int)

  /** Scenario 2 — jet split tree (`testutils/generators.go:381-466`): a
    * root jet splits into id+"0"/id+"1" every pulse; children carry
    * `first_prev_hash` = parent's hash. Exercises ST2 completeness, J4/J5
    * linkage and P6 prefix queries.
    */
  def jetSplitTree(
      spark: SparkSession,
      rootJet: String = "01",
      nPulses: Int = 3,
      startPulse: Long = GenesisPulse + PulseDelta,
      recordsPerDrop: Int = 2
  ): DataFrame = {
    import spark.implicits._
    def hashOf(jet: String, pulse: Long): Array[Byte] = ref("drop-" + jet, pulse, 0)
    var jets = Seq(rootJet)
    val rows = scala.collection.mutable.ArrayBuffer.empty[DropRow]
    for (p <- 0 until nPulses) {
      val pulse = startPulse + p * PulseDelta
      if (p == 0) {
        rows += DropRow(pulse, rootJet, hashOf(rootJet, pulse), null, null, recordsPerDrop)
      } else {
        jets = jets.flatMap(j => Seq(j + "0", j + "1"))
        rows ++= jets.map { j =>
          val parent = j.dropRight(1)
          DropRow(pulse, j, hashOf(j, pulse),
            hashOf(parent, pulse - PulseDelta), null, recordsPerDrop)
        }
      }
    }
    spark.createDataset(rows.toSeq).toDF()
  }

  /** Scenario 3 — multi-pulse record batches (`generators.go:276-304`):
    * D pulses × R records over the given jets, state-only, valid chains
    * (each record its own lifeline, no prev pointers).
    */
  def multiPulseBatches(
      spark: SparkSession,
      nPulses: Int,
      recordsPerPulse: Int,
      jets: Seq[String] = Seq("0", "1"),
      startPulse: Long = GenesisPulse + PulseDelta
  ): DataFrame = {
    import spark.implicits._
    val rows = for {
      p <- 0 until nPulses
      r <- 0 until recordsPerPulse
    } yield {
      val pulse = startPulse + p * PulseDelta
      val id = ref("batch", pulse, r.toLong)
      WireRow(r.toLong, id, id, jets(r % jets.size), "activate",
        ref("img", pulse, r.toLong), ref("mem", pulse, r.toLong), null,
        ref("raw", pulse, r.toLong), pulse)
    }
    spark.createDataset(rows).toDF()
  }
}
