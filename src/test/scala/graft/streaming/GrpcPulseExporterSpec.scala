package graft.streaming

import org.apache.spark.sql.functions._
import org.sparkproject.connect.grpc.CallOptions
import org.sparkproject.connect.grpc.stub.ClientCalls

import graft.SparkSpec
import graft.ingest.{GrpcTransport, GrpcWire}

/** The exporter-api service over a real netty socket: the
  * `exporter.PulseExporter/GetNextPulse` stream (exact reference proto,
  * `etl/exporter/pulse_exporter.proto`) serves the chain of complete
  * pulses with the prototype-filtered recount, long-polls when caught
  * up, and ends when the client cancels — `pulse_exporter_server.go:
  * 20-51` driven through a live client channel.
  */
class GrpcPulseExporterSpec extends SparkSpec {

  import spark.implicits._

  // chain 70000 -> 70010 -> 70020 -> 70030; 70020 incomplete (skipped by
  // the feed); 70030 chains over it via prev=70010? No — the feed walks
  // stored prev links, so the complete successor of 70010 must name it.
  private def pulses = Seq(
    (70010L, 70000L, true), (70020L, 70010L, false), (70030L, 70010L, true))
    .toDF("pulse_number", "prev_pulse_number", "is_complete")

  private def records = Seq(
    (70010L, "a"), (70010L, "b"), (70010L, "b"),
    (70030L, "a"), (70030L, "c"))
    .toDF("pulse_number", "payload")
    .withColumn("prototype_reference", encode(col("payload"), "UTF-8"))
    .drop("payload")

  private def withServer[A](pulsePeriodMs: Long = 50L)(
      body: (GrpcPulseExporter.Handle, org.sparkproject.connect.grpc.ManagedChannel) => A): A = {
    val handle = GrpcPulseExporter.start(pulses, records, port = 0, pulsePeriodMs = pulsePeriodMs)
    val ch = GrpcTransport.channel("localhost", handle.port)
    try body(handle, ch)
    finally { GrpcTransport.close(ch); handle.stop() }
  }

  private def take(ch: org.sparkproject.connect.grpc.ManagedChannel,
      from: Long, n: Int, prototypes: Seq[Array[Byte]] = Nil): List[GrpcWire.GetNextPulseResponse] =
    ClientCalls.blockingServerStreamingCall(
      ch, GrpcWire.GetNextPulseMethod, CallOptions.DEFAULT,
      GrpcWire.GetNextPulseRequest(from, prototypes))
      .asInstanceOf[java.util.Iterator[GrpcWire.GetNextPulseResponse]]
      .asScala.take(n).toList

  implicit private class RichIt[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
  }

  test("streams the chain of complete pulses with the filtered recount") {
    withServer() { (_, ch) =>
      val got = take(ch, 70000L, 2)
      assert(got.map(_.pulseNumber) == List(70010L, 70030L),
        "the incomplete 70020 must be skipped; 70030 chains from 70010")
      assert(got.map(_.prevPulseNumber) == List(70000L, 70010L))
      assert(got.map(_.recordAmount) == List(3L, 2L),
        "RecordAmount is the pulse's record count (storage.go:563-585 recount)")
    }
  }

  test("prototype filter narrows both admission and the recount") {
    withServer() { (_, ch) =>
      val got = take(ch, 70000L, 2, prototypes = Seq("b".getBytes, "c".getBytes))
      assert(got.map(_.pulseNumber) == List(70010L, 70030L))
      assert(got.map(_.recordAmount) == List(2L, 1L),
        "only records whose prototype_reference matches count")
    }
  }

  test("pollStep (the serving form) equals the oracled batch body on every cursor and filter") {
    val protoSets = Seq(Nil, Seq("b".getBytes, "c".getBytes), Seq("zzz".getBytes))
    for (from <- Seq(69990L, 70000L, 70010L, 70020L, 70030L); protos <- protoSets) {
      val batch = PulseFeed.nextCompletePulseFiltered(pulses, records, from, protos)
        .collect().headOption.map(r => (r.getAs[Long]("pulse_number"),
          r.getAs[Long]("prev_pulse_number"), r.getAs[Long]("record_amount")))
      val point = GrpcPulseExporter.pollStep(pulses, records, from, protos)
        .map(r => (r.pulseNumber, r.prevPulseNumber, r.recordAmount))
      assert(point == batch, s"from=$from protos=${protos.length}")
    }
  }

  test("two complete pulses sharing a prev (a reloaded fork): a matching-less " +
      "sibling must not stall the stream while its twin matches") {
    // the reference's query JOINs records, so only candidates WITH
    // matching records are admitted (storage.go:563-585) — probing just
    // min(pulse_number) and stalling on its empty recount diverges
    val forkPulses = Seq(
      (70010L, 70000L, true), (70020L, 70010L, true), (70030L, 70010L, true))
      .toDF("pulse_number", "prev_pulse_number", "is_complete")
    val forkRecords = Seq((70020L, "x"), (70030L, "b"), (70030L, "b"))
      .toDF("pulse_number", "payload")
      .withColumn("prototype_reference", encode(col("payload"), "UTF-8"))
      .drop("payload")
    // filtered: the smaller sibling matches nothing → serve the twin
    val filtered = GrpcPulseExporter.pollStep(
      forkPulses, forkRecords, 70010L, Seq("b".getBytes))
    assert(filtered.map(r => (r.pulseNumber, r.recordAmount)) == Some((70030L, 2L)),
      s"matching twin must be served past the matching-less sibling: $filtered")
    // unfiltered: both match → smallest-first (the deterministic
    // refinement of GORM's unordered Find)
    val both = GrpcPulseExporter.pollStep(forkPulses, forkRecords, 70010L, Nil)
    assert(both.map(_.pulseNumber) == Some(70020L))
    // nothing matches anywhere → the documented stall
    assert(GrpcPulseExporter.pollStep(
      forkPulses, forkRecords, 70010L, Seq("zzz".getBytes)).isEmpty)
  }

  test("concurrent subscribers each get the full chain (one pool thread per stream)") {
    withServer() { (_, ch) =>
      import scala.jdk.CollectionConverters._
      val results = new java.util.concurrent.ConcurrentHashMap[Int, List[Long]]()
      val threads = (0 until 4).map { i =>
        new Thread(() => results.put(i, take(ch, 70000L, 2).map(_.pulseNumber)))
      }
      threads.foreach(_.start())
      threads.foreach(_.join(30000))
      assert(results.size == 4)
      results.values().asScala.foreach(pns => assert(pns == List(70010L, 70030L)))
    }
  }

  test("cross-compat golden bytes: a foreign client's hand-assembled proto3 buffer " +
      "drives the live server, and the raw response bytes are the canonical layout") {
    // A protoc-generated Go client (the reference's, pulse_exporter.proto:
    // 5-20) is simulated END-TO-END without graft's codec on the client
    // side: the method descriptor below marshals raw Array[Byte]
    // verbatim, the request buffer is assembled by hand per the proto's
    // field numbers/wire types, and the response is decoded by hand from
    // the raw bytes the server put on the wire. Parsing leniencies any
    // conformant proto3 parser must accept are exercised deliberately:
    // out-of-order fields, a NON-minimal varint (padded continuation
    // bytes — legal on the wire, never produced by a canonical encoder),
    // and an unknown field that must be skipped.
    val rawMethod = org.sparkproject.connect.grpc.MethodDescriptor
      .newBuilder[Array[Byte], Array[Byte]]()
      .setType(org.sparkproject.connect.grpc.MethodDescriptor.MethodType.SERVER_STREAMING)
      .setFullMethodName("exporter.PulseExporter/GetNextPulse")
      .setRequestMarshaller(identityMarshaller)
      .setResponseMarshaller(identityMarshaller)
      .build()
    // GetNextPulseRequest{PulseNumberFrom: 70000, Prototypes: ["b"]},
    // fields REVERSED vs declaration order, PulseNumberFrom as a
    // 5-byte non-minimal varint, plus unknown field 7 (varint 9):
    //   field 2 (bytes):  tag 0x12, len 1, 'b'
    //   field 1 (varint): tag 0x08, 70000 padded = F0 A2 84 80 00
    //   field 7 (varint): tag 0x38, 9
    val request = Array[Int](
      0x12, 0x01, 'b'.toInt,
      0x08, 0xF0, 0xA2, 0x84, 0x80, 0x00,
      0x38, 0x09).map(_.toByte)
    withServer() { (_, ch) =>
      val raw = ClientCalls.blockingServerStreamingCall(
        ch, rawMethod, CallOptions.DEFAULT, request)
        .asInstanceOf[java.util.Iterator[Array[Byte]]]
      val first = raw.next()
      // canonical GetNextPulseResponse{PulseNumber: 70010, PrevPulseNumber:
      // 70000, RecordAmount: 2} — the prototype filter "b" admits 70010
      // with 2 matching records. varint(70010)=FA A2 04, varint(70000)=
      // F0 A2 04; exactly what protoc-generated Go emits and parses.
      assert(first.toSeq == Seq(
        0x08, 0xFA, 0xA2, 0x04, // PulseNumber = 1, varint
        0x10, 0xF0, 0xA2, 0x04, // PrevPulseNumber = 2, varint
        0x18, 0x02 // RecordAmount = 3, varint
      ).map(_.toByte),
        s"wire layout drifted from pulse_exporter.proto: ${first.map("%02X".format(_)).mkString(" ")}")
    }
  }

  private def identityMarshaller =
    new org.sparkproject.connect.grpc.MethodDescriptor.Marshaller[Array[Byte]] {
      override def stream(value: Array[Byte]): java.io.InputStream =
        new java.io.ByteArrayInputStream(value)
      override def parse(stream: java.io.InputStream): Array[Byte] = stream.readAllBytes()
    }

  test("long-poll: a caught-up stream stays open and the client ends it by cancelling") {
    withServer(pulsePeriodMs = 20L) { (_, ch) =>
      val it = ClientCalls.blockingServerStreamingCall(
        ch, GrpcWire.GetNextPulseMethod, CallOptions.DEFAULT,
        GrpcWire.GetNextPulseRequest(70010L))
        .asInstanceOf[java.util.Iterator[GrpcWire.GetNextPulseResponse]]
      assert(it.next().pulseNumber == 70030L)
      // the server is now long-polling past the chain head — no more
      // complete successors exist, so the stream is open but silent;
      // closing the channel cancels it (how a reference client ends the
      // infinite stream too)
      val poll = new java.util.concurrent.CompletableFuture[Boolean]()
      val t = new Thread(() => try poll.complete(it.hasNext) catch { case _: Throwable => poll.complete(false) })
      t.start()
      Thread.sleep(150)
      assert(!poll.isDone, "caught-up stream must long-poll, not complete")
      // withServer's teardown closes the channel; the polling thread then
      // observes the cancellation instead of blocking forever
      new Thread(() => { Thread.sleep(200); GrpcTransport.close(ch) }).start()
      assert(!poll.get(10, java.util.concurrent.TimeUnit.SECONDS))
    }
  }
}
