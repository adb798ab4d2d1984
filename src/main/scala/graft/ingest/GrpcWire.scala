package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}

import org.sparkproject.connect.grpc.MethodDescriptor
import org.sparkproject.connect.protobuf.{CodedInputStream, CodedOutputStream}

/** The exporter wire protocol: hand-rolled proto3 codecs and gRPC method
  * descriptors for the two services at the engine's ingest boundary.
  *
  * The gRPC + protobuf runtime is the one the Apache Spark distribution
  * itself ships (relocated into the `spark-connect` jar for Spark
  * Connect, `org.sparkproject.connect.{grpc,protobuf}`) — the API is
  * upstream grpc-java/protobuf-java unchanged, only the package prefix
  * differs. Using it keeps the build's rule of zero dependencies beyond
  * the Spark distribution while making the S1/S2 transport a REAL wire
  * protocol instead of a replay harness: real HTTP/2 framing, real
  * proto3 bytes, real stream lifecycle.
  *
  * Two services:
  *
  *  - `exporter.PulseExporter/GetNextPulse` — the engine's own
  *    DOWNSTREAM feed (the reference's exporter-api,
  *    `etl/exporter/pulse_exporter.proto`). Message layout is the
  *    reference's exactly: request `{int64 PulseNumberFrom = 1;
  *    repeated bytes Prototypes = 2}`, response `{int64 PulseNumber = 1;
  *    int64 PrevPulseNumber = 2; int64 RecordAmount = 3}`, server
  *    streaming. A reference client could consume this listener.
  *
  *  - `exporter.RecordExporter/Export` — the UPSTREAM record fetch the
  *    extractor drives (`etl/extractor/platform_impl.go:255-322`). The
  *    reference's request fields (`GetRecords{PulseNumber, RecordNumber,
  *    Count}`) keep their meaning; the streamed record's field layout is
  *    graft's own (the node-side message embeds insolar's generated
  *    record types, which live outside the reference repo), carrying the
  *    [[graft.model.Schemas.wireRecords]] columns plus the
  *    `ShouldIterateFrom` redirect. The transport SEMANTICS — portioned
  *    streams, resume-from-record-number, next-pulse end marker,
  *    iterate-from redirects, NOT_FOUND / RESOURCE_EXHAUSTED statuses —
  *    are the reference's unchanged, so [[Transport.fetchPulse]] drives
  *    both this wire and the replay harness through one contract.
  *
  * proto3 canon: zero/empty fields are omitted on the wire and read back
  * as defaults; unknown fields are skipped (forward compatibility).
  */
object GrpcWire {

  // ---- messages --------------------------------------------------------

  /** `GetRecords` (request): PulseNumber=1, RecordNumber=2, Count=3. */
  final case class GetRecords(pulseNumber: Long, recordNumber: Int, count: Int)

  /** One streamed record frame: the wire-record columns (field numbers
    * 1-10 in [[graft.model.Schemas.wireRecords]] order) plus
    * `should_iterate_from = 11` (0 = unset; valid pulse numbers are
    * ≥ 65536, insolar's MinTimePulse, so 0 is never a real redirect).
    */
  final case class RecordFrame(
      recordNumber: Long,
      id: Array[Byte],
      objectId: Array[Byte],
      jetId: String,
      virtualType: String,
      image: Array[Byte],
      memory: Array[Byte],
      prevStateId: Array[Byte],
      rawData: Array[Byte],
      pulseNumber: Long,
      shouldIterateFrom: Long = 0L)

  /** `GetNextPulseRequest`: PulseNumberFrom=1, Prototypes=2 (exact
    * reference layout, `etl/exporter/pulse_exporter.proto`).
    */
  final case class GetNextPulseRequest(pulseNumberFrom: Long, prototypes: Seq[Array[Byte]] = Nil)

  /** `GetNextPulseResponse`: PulseNumber=1, PrevPulseNumber=2,
    * RecordAmount=3 (exact reference layout).
    */
  final case class GetNextPulseResponse(pulseNumber: Long, prevPulseNumber: Long, recordAmount: Long)

  // ---- codecs ----------------------------------------------------------

  private def encode(write: CodedOutputStream => Unit): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = CodedOutputStream.newInstance(baos)
    write(out)
    out.flush()
    baos.toByteArray
  }

  private def writeGetRecords(m: GetRecords, out: CodedOutputStream): Unit = {
    if (m.pulseNumber != 0) out.writeInt64(1, m.pulseNumber)
    if (m.recordNumber != 0) out.writeInt32(2, m.recordNumber)
    if (m.count != 0) out.writeInt32(3, m.count)
  }

  // Decoders dispatch on (field number, wire type) — a known field number
  // carrying an UNEXPECTED wire type is skipped like an unknown field, not
  // parsed. Dispatching on the number alone would read e.g. a
  // length-delimited value's length prefix as a varint payload and desync
  // the rest of the message; proto3's forward-compatibility contract is
  // per (number, type), which is exactly what protoc-generated parsers do.
  private final val Varint = 0
  private final val Delimited = 2

  private def readGetRecords(in: CodedInputStream): GetRecords = {
    var pulse = 0L; var recNo = 0; var count = 0
    var tag = in.readTag()
    while (tag != 0) {
      (tag >>> 3, tag & 7) match {
        case (1, Varint) => pulse = in.readInt64()
        case (2, Varint) => recNo = in.readInt32()
        case (3, Varint) => count = in.readInt32()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    GetRecords(pulse, recNo, count)
  }

  private def writeRecordFrame(m: RecordFrame, out: CodedOutputStream): Unit = {
    if (m.recordNumber != 0) out.writeInt64(1, m.recordNumber)
    def bytes(field: Int, v: Array[Byte]): Unit =
      if (v != null && v.length > 0) out.writeByteArray(field, v)
    bytes(2, m.id)
    bytes(3, m.objectId)
    if (m.jetId != null && m.jetId.nonEmpty) out.writeString(4, m.jetId)
    if (m.virtualType != null && m.virtualType.nonEmpty) out.writeString(5, m.virtualType)
    bytes(6, m.image)
    bytes(7, m.memory)
    bytes(8, m.prevStateId)
    bytes(9, m.rawData)
    if (m.pulseNumber != 0) out.writeInt64(10, m.pulseNumber)
    if (m.shouldIterateFrom != 0) out.writeInt64(11, m.shouldIterateFrom)
  }

  private def readRecordFrame(in: CodedInputStream): RecordFrame = {
    var recNo = 0L; var pulse = 0L; var sif = 0L
    // proto3 cannot carry null bytes: absent == empty on the wire, so
    // EVERY bytes field reads back as Array.empty, uniformly. (A null on
    // the send side therefore arrives as empty after a wire hop — the
    // same canon the reference's Go slices live under, where nil and
    // empty marshal identically; Canonicalize's empty-ref normalization
    // then treats both paths' rows the same.)
    var id: Array[Byte] = Array.empty
    var objectId: Array[Byte] = Array.empty
    var jetId = ""; var virtualType = ""
    var image: Array[Byte] = Array.empty; var memory: Array[Byte] = Array.empty
    var prevStateId: Array[Byte] = Array.empty; var rawData: Array[Byte] = Array.empty
    var tag = in.readTag()
    while (tag != 0) {
      (tag >>> 3, tag & 7) match {
        case (1, Varint) => recNo = in.readInt64()
        case (2, Delimited) => id = in.readByteArray()
        case (3, Delimited) => objectId = in.readByteArray()
        case (4, Delimited) => jetId = in.readString()
        case (5, Delimited) => virtualType = in.readString()
        case (6, Delimited) => image = in.readByteArray()
        case (7, Delimited) => memory = in.readByteArray()
        case (8, Delimited) => prevStateId = in.readByteArray()
        case (9, Delimited) => rawData = in.readByteArray()
        case (10, Varint) => pulse = in.readInt64()
        case (11, Varint) => sif = in.readInt64()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    RecordFrame(recNo, id, objectId, jetId, virtualType, image, memory,
      prevStateId, rawData, pulse, sif)
  }

  private def writeNextPulseRequest(m: GetNextPulseRequest, out: CodedOutputStream): Unit = {
    if (m.pulseNumberFrom != 0) out.writeInt64(1, m.pulseNumberFrom)
    m.prototypes.foreach(p => out.writeByteArray(2, p))
  }

  private def readNextPulseRequest(in: CodedInputStream): GetNextPulseRequest = {
    var from = 0L
    val protos = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var tag = in.readTag()
    while (tag != 0) {
      (tag >>> 3, tag & 7) match {
        case (1, Varint) => from = in.readInt64()
        case (2, Delimited) => protos += in.readByteArray()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    GetNextPulseRequest(from, protos.toSeq)
  }

  private def writeNextPulseResponse(m: GetNextPulseResponse, out: CodedOutputStream): Unit = {
    if (m.pulseNumber != 0) out.writeInt64(1, m.pulseNumber)
    if (m.prevPulseNumber != 0) out.writeInt64(2, m.prevPulseNumber)
    if (m.recordAmount != 0) out.writeInt64(3, m.recordAmount)
  }

  private def readNextPulseResponse(in: CodedInputStream): GetNextPulseResponse = {
    var pn = 0L; var prev = 0L; var amount = 0L
    var tag = in.readTag()
    while (tag != 0) {
      (tag >>> 3, tag & 7) match {
        case (1, Varint) => pn = in.readInt64()
        case (2, Varint) => prev = in.readInt64()
        case (3, Varint) => amount = in.readInt64()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    GetNextPulseResponse(pn, prev, amount)
  }

  // exposed for codec round-trip tests
  private[ingest] def encodeGetRecords(m: GetRecords): Array[Byte] = encode(writeGetRecords(m, _))
  private[ingest] def decodeGetRecords(b: Array[Byte]): GetRecords =
    readGetRecords(CodedInputStream.newInstance(b))
  private[ingest] def encodeRecordFrame(m: RecordFrame): Array[Byte] = encode(writeRecordFrame(m, _))
  private[ingest] def decodeRecordFrame(b: Array[Byte]): RecordFrame =
    readRecordFrame(CodedInputStream.newInstance(b))
  private[ingest] def encodeNextPulseRequest(m: GetNextPulseRequest): Array[Byte] =
    encode(writeNextPulseRequest(m, _))
  private[ingest] def decodeNextPulseRequest(b: Array[Byte]): GetNextPulseRequest =
    readNextPulseRequest(CodedInputStream.newInstance(b))
  private[ingest] def encodeNextPulseResponse(m: GetNextPulseResponse): Array[Byte] =
    encode(writeNextPulseResponse(m, _))
  private[ingest] def decodeNextPulseResponse(b: Array[Byte]): GetNextPulseResponse =
    readNextPulseResponse(CodedInputStream.newInstance(b))

  // ---- method descriptors ----------------------------------------------

  private def marshaller[T](enc: T => Array[Byte], dec: Array[Byte] => T): MethodDescriptor.Marshaller[T] =
    new MethodDescriptor.Marshaller[T] {
      override def stream(value: T): InputStream = new ByteArrayInputStream(enc(value))
      override def parse(stream: InputStream): T = dec(stream.readAllBytes())
    }

  /** `exporter.RecordExporter/Export` — server streaming. */
  val ExportMethod: MethodDescriptor[GetRecords, RecordFrame] =
    MethodDescriptor.newBuilder[GetRecords, RecordFrame]()
      .setType(MethodDescriptor.MethodType.SERVER_STREAMING)
      .setFullMethodName(MethodDescriptor.generateFullMethodName("exporter.RecordExporter", "Export"))
      .setRequestMarshaller(marshaller(encodeGetRecords, decodeGetRecords))
      .setResponseMarshaller(marshaller(encodeRecordFrame, decodeRecordFrame))
      .build()

  /** `exporter.PulseExporter/GetNextPulse` — server streaming (the
    * reference's exporter-api service name and method,
    * `etl/exporter/pulse_exporter.proto`).
    */
  val GetNextPulseMethod: MethodDescriptor[GetNextPulseRequest, GetNextPulseResponse] =
    MethodDescriptor.newBuilder[GetNextPulseRequest, GetNextPulseResponse]()
      .setType(MethodDescriptor.MethodType.SERVER_STREAMING)
      .setFullMethodName(MethodDescriptor.generateFullMethodName("exporter.PulseExporter", "GetNextPulse"))
      .setRequestMarshaller(marshaller(encodeNextPulseRequest, decodeNextPulseRequest))
      .setResponseMarshaller(marshaller(encodeNextPulseResponse, decodeNextPulseResponse))
      .build()
}
