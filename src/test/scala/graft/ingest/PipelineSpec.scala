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
    val records = spark.read.parquet(s"$base/records")
    assert(records.count() == 24)
    val status = flakyPipe.status().orderBy("pulse_number").collect()
    assert(status.length == 4)
    assert(status.forall(_.getAs[Long]("record_amount") == 6L))

    // re-running the whole range is idempotent (ST4)
    val pipe2 = new Pipeline(spark, base, src(flaky = false))
    val r2 = pipe2.run(start, start + 30)
    assert(r2.missing.isEmpty)
    assert(spark.read.parquet(s"$base/records").count() == 24)
    // jet_drops got the same treatment
    assert(spark.read.parquet(s"$base/jet_drops").count() == 8) // 4 pulses x 2 jets
  }
}
