package graft.ingest

import java.util.concurrent.TimeUnit

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.sparkproject.connect.grpc.{CallOptions, Channel, ManagedChannel, Status, StatusRuntimeException}
import org.sparkproject.connect.grpc.netty.NettyChannelBuilder
import org.sparkproject.connect.grpc.stub.ClientCalls

import graft.model.Schemas

/** S1/S2 over the real wire: a gRPC client for
  * `exporter.RecordExporter/Export` implementing
  * [[Transport.RecordStream]], so [[Transport.fetchPulse]] /
  * [[Pipeline]] drive a live exporter exactly as they drive the replay
  * harness — the extractor's `client.Export(GetRecords{PulseNumber,
  * RecordNumber, Count})` portion loop (`etl/extractor/
  * platform_impl.go:255-322`) with the same status mapping:
  *
  *  - `NOT_FOUND` → [[Transport.PulseNotFound]] (the pulse is not on the
  *    exporter; the reference sleeps and re-asks its chain head,
  *    `platform_impl.go:171-177` — [[Pipeline]] records the gap for the
  *    ST3 reload path)
  *  - `RESOURCE_EXHAUSTED` → [[Transport.RateLimited]] (the reference's
  *    `isRateLimitError`, half-pulse pause then reopen at the cursor)
  *  - any other stream failure → [[Transport.StreamDropped]] (reopen at
  *    the cursor; records already held are never re-fetched)
  *
  * The channel is plaintext HTTP/2 like the reference's exporter
  * connection default (`etl/connection/grpc.go` insecure dial option).
  */
object GrpcTransport {

  /** Open a plaintext channel to an exporter. Callers own `shutdown()`. */
  def channel(host: String, port: Int): ManagedChannel =
    NettyChannelBuilder.forAddress(host, port).usePlaintext().build()

  def close(ch: ManagedChannel): Unit = {
    ch.shutdownNow()
    ch.awaitTermination(5, TimeUnit.SECONDS)
    ()
  }

  /** Wire record frame → Spark wire row ([[Schemas.wireRecords]]). */
  private[ingest] def rowOf(f: GrpcWire.RecordFrame): Row =
    new GenericRowWithSchema(Array[Any](
      f.recordNumber, f.id, f.objectId, f.jetId, f.virtualType,
      f.image, f.memory, f.prevStateId, f.rawData, f.pulseNumber),
      Schemas.wireRecords)

  /** Spark wire row → frame (the serve/test side of the same mapping). */
  private[ingest] def frameOf(r: Row, recordNumber: Long): GrpcWire.RecordFrame =
    GrpcWire.RecordFrame(
      recordNumber,
      r.getAs[Array[Byte]]("id"),
      r.getAs[Array[Byte]]("object_id"),
      r.getAs[String]("jet_id"),
      r.getAs[String]("virtual_type"),
      r.getAs[Array[Byte]]("image"),
      r.getAs[Array[Byte]]("memory"),
      r.getAs[Array[Byte]]("prev_state_id"),
      r.getAs[Array[Byte]]("raw_data"),
      r.getAs[Long]("pulse_number"))

  /** The [[Transport.RecordStream]] facade over a live channel. */
  final class GrpcRecordStream(channel: Channel) extends Transport.RecordStream {

    override def export(pulse: Long, recordNumber: Int, count: Int): Iterator[Transport.Frame] = {
      // the call opens lazily on first hasNext — translate() maps status
      // codes wherever they surface (open or mid-stream)
      val it =
        try ClientCalls.blockingServerStreamingCall(
          channel, GrpcWire.ExportMethod, CallOptions.DEFAULT,
          GrpcWire.GetRecords(pulse, recordNumber, count))
        catch { case e: Throwable => translate(pulse, e) }
      new Iterator[Transport.Frame] {
        override def hasNext: Boolean =
          try it.hasNext catch { case e: Throwable => translate(pulse, e) }
        override def next(): Transport.Frame = {
          val f = try it.next() catch { case e: Throwable => translate(pulse, e) }
          Transport.Frame(f.pulseNumber, rowOf(f),
            if (f.shouldIterateFrom != 0L) Some(f.shouldIterateFrom) else None)
        }
      }
    }
  }

  private def translate(pulse: Long, e: Throwable): Nothing = e match {
    case s: StatusRuntimeException => s.getStatus.getCode match {
      case Status.Code.NOT_FOUND => throw new Transport.PulseNotFound(pulse)
      case Status.Code.RESOURCE_EXHAUSTED => throw new Transport.RateLimited(s.getStatus.toString)
      case _ => throw new Transport.StreamDropped(s.getStatus.toString)
    }
    case other => throw new Transport.StreamDropped(String.valueOf(other.getMessage))
  }
}
