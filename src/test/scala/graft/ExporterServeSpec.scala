package graft

import org.apache.spark.sql.functions._

import graft.ingest.{GrpcTransport, GrpcWire}
import graft.model.Domain
import graft.streaming.PulseFeed

/** The exporter-api binary's startup path (`ExporterServe.bootstrap` —
  * what `main` runs short of blocking) on the real testdata domain: the
  * served views wire up (including the prototype-column default for a
  * store that carries none) and the first streamed response over the
  * live socket equals the library feed body's answer — the same
  * `nextCompletePulseFiltered` whose DataFrame twin is oracled as
  * `be_exporter_next`.
  */
class ExporterServeSpec extends SparkSpec {

  // sf0.01: the smallest corpus whose jet trees actually COVER (at
  // sf0.001 no pulse passes the completeness aggregator, so the feed is
  // legitimately empty there — be_exporter_next's oracle agrees)
  private val dir = "/root/testdata/sf0.01"

  test("ExporterServe.bootstrap serves the feed from the testdata domain over gRPC") {
    val pulses = Domain.servedPulses(spark, dir)
    val records = Domain.servedRecords(spark, dir)
      .withColumn("prototype_reference", lit(null).cast("binary"))
    // a cursor whose complete, record-bearing successor exists — derived
    // from the data so testdata regeneration cannot strand the test
    val cursor = pulses.filter(col("is_complete"))
      .join(records.select("pulse_number").distinct(), "pulse_number")
      .orderBy("pulse_number").select("prev_pulse_number").collect().headOption
    assume(cursor.nonEmpty, "no complete record-bearing pulse in this corpus")
    val from = cursor.get.getLong(0)
    val expected = PulseFeed.nextCompletePulseFiltered(pulses, records, from, Nil)
      .collect()
    assume(expected.nonEmpty, s"no feed successor for cursor $from")

    val handle = ExporterServe.bootstrap(spark, dir, port = 0, pulsePeriodMs = 50L)
    val ch = GrpcTransport.channel("localhost", handle.port)
    try {
      val got = org.sparkproject.connect.grpc.stub.ClientCalls.blockingServerStreamingCall(
        ch, GrpcWire.GetNextPulseMethod,
        org.sparkproject.connect.grpc.CallOptions.DEFAULT,
        GrpcWire.GetNextPulseRequest(from)).next()
      assert(got.pulseNumber == expected.head.getAs[Long]("pulse_number"))
      assert(got.prevPulseNumber == expected.head.getAs[Long]("prev_pulse_number"))
      assert(got.recordAmount == expected.head.getAs[Long]("record_amount"))
    } finally { GrpcTransport.close(ch); handle.stop() }
  }

  test("a subscriber over a LIVE ingest store observes pulses committed AFTER " +
      "the exporter started — the per-poll views re-resolve, never freeze") {
    // the exporter-api and the block-explorer daemon run side by side in
    // every real deployment: a captured DataFrame freezes its parquet
    // file listing at server start, which would replay the boot-time
    // snapshot forever (and a server started inside the startup window
    // would long-poll an empty frame for the stream's whole life)
    val base = java.nio.file.Files.createTempDirectory("graft-exporter-live").toString
    val start = gen.Fixtures.GenesisPulse + gen.Fixtures.PulseDelta
    val wire = gen.Fixtures.multiPulseBatches(spark, nPulses = 2,
      recordsPerPulse = 6, startPulse = start)
    // boot-time store: ONLY pulse 0 exists (complete+sequential)
    ingest.PulseWriter.commitPulse(
      wire.filter(col("pulse_number") === start), base)
    import spark.implicits._
    def pulseRow(i: Int, complete: Boolean) = {
      val p = start + i * gen.Fixtures.PulseDelta
      (p, p - gen.Fixtures.PulseDelta, p + gen.Fixtures.PulseDelta,
        complete, complete, 2, 6L, p - ingest.Canonicalize.MinTimePulse)
    }
    Seq(pulseRow(0, complete = true))
      .toDF("pulse_number", "prev_pulse_number", "next_pulse_number",
        "is_complete", "is_sequential", "jet_drop_amount", "record_amount",
        "timestamp")
      .coalesce(1).write.parquet(s"$base/pulses")

    val handle = ExporterServe.bootstrap(spark, base, port = 0, pulsePeriodMs = 50L)
    val ch = GrpcTransport.channel("localhost", handle.port)
    try {
      // subscribe FROM pulse 0: its successor does not exist yet, so the
      // stream long-polls; then the "daemon" commits pulse 1 and appends
      // it to the pulses dimension — the poll must pick it up
      val got = new java.util.concurrent.SynchronousQueue[GrpcWire.GetNextPulseResponse]()
      val reader = new Thread(() => {
        val it = org.sparkproject.connect.grpc.stub.ClientCalls.blockingServerStreamingCall(
          ch, GrpcWire.GetNextPulseMethod,
          org.sparkproject.connect.grpc.CallOptions.DEFAULT,
          GrpcWire.GetNextPulseRequest(start))
        got.put(it.next())
      }, "live-subscriber")
      reader.start()
      Thread.sleep(300) // several empty polls against the boot snapshot
      val p1 = start + gen.Fixtures.PulseDelta
      ingest.PulseWriter.commitPulse(wire.filter(col("pulse_number") === p1), base)
      Seq(pulseRow(1, complete = true))
        .toDF("pulse_number", "prev_pulse_number", "next_pulse_number",
          "is_complete", "is_sequential", "jet_drop_amount", "record_amount",
          "timestamp")
        .coalesce(1).write.mode("append").parquet(s"$base/pulses")
      val resp = got.poll(30, java.util.concurrent.TimeUnit.SECONDS)
      assert(resp != null, "the stream never served the post-start pulse")
      assert(resp.pulseNumber == p1 && resp.prevPulseNumber == start)
      assert(resp.recordAmount == 6L)
      reader.join(5000)
    } finally { GrpcTransport.close(ch); handle.stop() }
  }

  test("the serve-side recount reaches the records artifact as a pushed pulse predicate") {
    // the per-poll recount must prune to one pulse's row groups, never
    // rescan the fact (the indexed-DB analog the poll loop relies on)
    val records = Domain.servedRecords(spark, dir)
    val pn = records.select("pulse_number").head().getLong(0)
    val p = records.filter(col("pulse_number") === pn)
      .groupBy().count().queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("EqualTo(pulse_number"),
      s"recount plan must push the pulse bound to parquet:\n${p.take(2000)}")
  }
}
