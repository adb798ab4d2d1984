package graft.ingest

import graft.SparkSpec
import graft.gen.Fixtures
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("driver loop ingests pulses, detects the gap, and reloads it (ST1/ST3/ST4)") {
    val base = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val start = Fixtures.GenesisPulse + Fixtures.PulseDelta
    val wireAll = Fixtures.multiPulseBatches(spark, nPulses = 4, recordsPerPulse = 6,
      startPulse = start)

    // the source "loses" pulse start+20 on the first ask, then heals
    var asked = Set.empty[Long]
    def src(flaky: Boolean)(pulse: Long) = {
      val out = wireAll.filter(col("pulse_number") === pulse)
      val lose = flaky && pulse == start + 20 && !asked.contains(pulse)
      asked += pulse
      if (lose || out.isEmpty) None else Some(out)
    }

    val flakyPipe = new Pipeline(spark, base, src(flaky = true))
    val r1 = flakyPipe.run(start, start + 30)
    assert(r1.ingested == Seq(start, start + 10, start + 30))
    assert(r1.missing == Seq(start + 20))
    assert(r1.reloaded == Seq(start + 20)) // re-request healed it

    // after reload everything is present and counters are right
    val records = storeTable(base, "records")
    assert(records.count() == 24)
    val status = flakyPipe.status().orderBy("pulse_number").collect()
    assert(status.length == 4)
    assert(status.forall(_.getAs[Long]("record_amount") == 6L))

    // re-running the whole range is idempotent (ST4)
    val pipe2 = new Pipeline(spark, base, src(flaky = false))
    val r2 = pipe2.run(start, start + 30)
    assert(r2.missing.isEmpty)
    assert(storeTable(base, "records").count() == 24)
    // jet_drops got the same treatment
    assert(storeTable(base, "jet_drops").count() == 8) // 4 pulses x 2 jets
  }

  test("a pulse whose records committed but whose jet_drops write was lost is " +
      "detected missing and healed — gap detection keys off BOTH tables") {
    // commitPulse writes records before jet_drops: a crash between the
    // two leaves a records partition with no drops row; a gap scan keyed
    // off records alone would classify the pulse healthy forever
    val base = java.nio.file.Files.createTempDirectory("graft-pipe-drophole").toString
    val start = Fixtures.GenesisPulse + Fixtures.PulseDelta
    val wire = Fixtures.multiPulseBatches(spark, nPulses = 2, recordsPerPulse = 6,
      startPulse = start)
    def src(pulse: Long) = {
      val out = wire.filter(col("pulse_number") === pulse)
      if (out.isEmpty) None else Some(out)
    }
    val pipe = new Pipeline(spark, base, src)
    assert(pipe.run(start, start).missing.isEmpty)
    // the crash window, produced the way it actually happens: the second
    // pulse's RECORDS commit lands (manifested) but the process dies
    // before the jet_drops commit — so jet_drops' manifest simply never
    // learned the pulse (under snapshot manifests a partition cannot
    // half-disappear out from under its manifest; loss is "the commit
    // never published", not a torn directory)
    PulseWriter.writePulsePartition(
      Spine(wire.filter(col("pulse_number") === (start + 10))),
      "records", base, pulses = Some(Seq(start + 10)))
    // the regression shape: the FEED no longer serves these pulses (a
    // pruned exporter), so only the gap SCAN can notice the hole — a
    // records-only present set would report nothing missing forever
    val pruned = new Pipeline(spark, base, _ => None)
    val r = pruned.run(start, start + 10)
    assert(r.missing == Seq(start + 10),
      s"the drops hole must be classified missing: $r")
    // a source that heals on re-request restores the partition through
    // the reload path of a fresh round
    val healing = new Pipeline(spark, base, src)
    val r2 = healing.run(start, start + 10)
    assert(storeTable(base, "jet_drops")
      .filter(col("pulse_number") === (start + 10)).count() == 2L,
      s"the re-ingest must restore the jet_drops partition: $r2")
    assert(healing.run(start, start + 10).missing.isEmpty)
  }

  test("the stored record hash is the 32-byte sha256 DIGEST of raw_data, " +
      "not the hex string's bytes") {
    val base = java.nio.file.Files.createTempDirectory("graft-pipe-hash").toString
    val start = Fixtures.GenesisPulse + Fixtures.PulseDelta
    val wire = Fixtures.multiPulseBatches(spark, 1, recordsPerPulse = 4, startPulse = start)
    PulseWriter.commitPulse(wire, base)
    val rows = storeTable(base, "records")
      .select("hash", "raw_data").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Array[Byte]]("hash")
      assert(h.length == 32, s"sha256 digest must be 32 bytes, got ${h.length}")
      val expected = java.security.MessageDigest.getInstance("SHA-256")
        .digest(Option(r.getAs[Array[Byte]]("raw_data")).getOrElse(Array.emptyByteArray))
      assert(h.sameElements(expected), "hash must equal sha256(raw_data)")
    }
  }
}
