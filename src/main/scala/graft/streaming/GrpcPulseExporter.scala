package graft.streaming

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.DataFrame
import org.sparkproject.connect.grpc.{Server, ServerServiceDefinition, Status}
import org.sparkproject.connect.grpc.netty.NettyServerBuilder
import org.sparkproject.connect.grpc.stub.{ServerCallStreamObserver, ServerCalls, StreamObserver}

import graft.ingest.GrpcWire
import graft.ingest.GrpcWire.{GetNextPulseRequest, GetNextPulseResponse}

/** The exporter-api binary's gRPC surface (S6/ST5): serve
  * `exporter.PulseExporter/GetNextPulse` — the reference's service name,
  * method, and exact message layout (`etl/exporter/pulse_exporter.proto`,
  * `pulse_exporter_server.go:20-51`) — over the engine's pulse/record
  * tables. Long-poll loop per stream, exactly the reference's:
  *
  *   - fetch the next COMPLETE pulse whose stored prev is the cursor and
  *     whose records match the prototype filter, with the FILTERED record
  *     count (`GetNextCompletePulseFilterByPrototypeReference`,
  *     `etl/storage/storage.go:563-585`) — the
  *     [[PulseFeed.nextCompletePulseFiltered]] body, whose DataFrame twin
  *     is the oracled `be_exporter_next`
  *   - caught up → sleep one pulse period, ask again (the stream never
  *     completes server-side; the client ends it by cancelling)
  *
  * The per-stream query is a broadcast join against a single candidate
  * pulse row — the 100 TB posture is the pulse spine's, not the fact
  * table's. Each live stream holds one thread of the cached pool (the
  * reference holds one goroutine); the driver-side collect is one row.
  */
object GrpcPulseExporter {

  final class Handle private[GrpcPulseExporter] (server: Server,
      pool: java.util.concurrent.ExecutorService) {
    def port: Int = server.getPort
    def stop(): Unit = {
      server.shutdownNow()
      server.awaitTermination(5, TimeUnit.SECONDS)
      pool.shutdownNow()
      ()
    }
  }

  /** The service definition — shared by the netty listener and in-process
    * test servers.
    */
  def service(pulses: DataFrame, records: DataFrame,
      pulsePeriodMs: Long): ServerServiceDefinition =
    ServerServiceDefinition.builder("exporter.PulseExporter")
      .addMethod(GrpcWire.GetNextPulseMethod,
        ServerCalls.asyncServerStreamingCall(
          new ServerCalls.ServerStreamingMethod[GetNextPulseRequest, GetNextPulseResponse] {
            override def invoke(req: GetNextPulseRequest,
                obs: StreamObserver[GetNextPulseResponse]): Unit =
              feed(pulses, records, pulsePeriodMs, req, obs)
          }))
      .build()

  /** One poll step, decomposed for the serving path: the batch body
    * ([[PulseFeed.nextCompletePulseFiltered]], the oracled
    * `be_exporter_next` twin) scans the records side bounded only by the
    * join — right for a batch query, wrong per-poll at 100 TB. Here the
    * candidate probe touches ONLY the pulse spine (one row), and the
    * recount runs with a STATIC `pulse_number = pn` predicate the
    * range-clustered records artifact prunes to one pulse's row groups —
    * the columnar analog of the reference's indexed
    * `JOIN records ... WHERE pulses.prev_pulse_number = ?`
    * (`etl/storage/storage.go:563-585`). Semantics are the batch body's
    * exactly, including the stall: a complete successor whose records
    * match nothing is NOT served — the stream waits at the cursor, as the
    * reference's `currentPN >= receivedPulse.PulseNumber` sleep does for
    * the zero-value pulse its empty Find returns.
    */
  private[streaming] def pollStep(pulses: DataFrame, records: DataFrame,
      from: Long, prototypes: Seq[Array[Byte]]): Option[GetNextPulseResponse] = {
    import org.apache.spark.sql.functions.{col, min}
    val cand = pulses
      .filter(col("is_complete") && col("prev_pulse_number") === from)
      .agg(min(col("pulse_number"))).collect().head
    if (cand.isNullAt(0)) None
    else {
      val pn = cand.getLong(0)
      val matched = PulseFeed.prototypeFiltered(records, prototypes)
      val amount = matched.filter(col("pulse_number") === pn).count()
      if (amount == 0) None else Some(GetNextPulseResponse(pn, from, amount))
    }
  }

  private def feed(pulses: DataFrame, records: DataFrame, pulsePeriodMs: Long,
      req: GetNextPulseRequest, obs: StreamObserver[GetNextPulseResponse]): Unit = {
    val sco = obs.asInstanceOf[ServerCallStreamObserver[GetNextPulseResponse]]
    var current = req.pulseNumberFrom
    try {
      while (!sco.isCancelled) {
        pollStep(pulses, records, current, req.prototypes) match {
          case Some(resp) =>
            sco.onNext(resp)
            current = resp.pulseNumber
          case None =>
            Thread.sleep(pulsePeriodMs)
        }
      }
    } catch {
      case _: InterruptedException => () // pool shutdown
      case e: Throwable =>
        // surface a real serve failure to the client (the reference
        // returns the send error up the handler, pulse_exporter_server.go:
        // 42-47); a post-cancel race is just the stream ending
        if (!sco.isCancelled)
          try obs.onError(Status.INTERNAL.withDescription(
            String.valueOf(e.getMessage)).asRuntimeException())
          catch { case _: Throwable => () }
    }
  }

  /** Bind the netty listener (`port=0` → ephemeral). Callers own
    * `stop()`.
    */
  def start(pulses: DataFrame, records: DataFrame, port: Int = 0,
      pulsePeriodMs: Long = 10000L): Handle = {
    val pool = Executors.newCachedThreadPool()
    val server = NettyServerBuilder.forPort(port)
      .executor(pool)
      // match the reference transport's 1 GiB message cap
      // (configuration.go:67 MaxTransportMsg) on the serve side too
      .maxInboundMessageSize(1 << 30)
      .addService(service(pulses, records, pulsePeriodMs))
      .build()
      .start()
    new Handle(server, pool)
  }
}
