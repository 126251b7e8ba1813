package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.concurrent.TimeUnit

import scala.collection.mutable.ArrayBuffer

import org.sparkproject.connect.grpc.{MethodDescriptor, Server, ServerServiceDefinition, Status}
import org.sparkproject.connect.grpc.MethodDescriptor.MethodType
import org.sparkproject.connect.grpc.netty.NettyServerBuilder
import org.sparkproject.connect.grpc.stub.{ServerCalls, StreamObserver}

/** The reference's gRPC surface (S2, epic_services/server.py:88-191) served
  * natively: the `epic_post_process` service of epic_grpc/epic_image.proto
  * with all four RPCs —
  *
  *   - `filter_and_save(epic_image) returns (empty)` — unary ingest; the
  *     request bytes ARE a serialized `epic_image`, which is exactly the
  *     protobuf framing [[ImageFrameDecoder]] already accepts, so the
  *     message drops straight into the stream's frame buffer;
  *   - `filter_and_save_chunk(stream epic_image) returns (empty)` —
  *     client-streaming ingest (client.py:66-84 `chunk_data`: JSON header
  *     list on the first chunk only, cube bytes split at chunk_size);
  *     reassembled into one frame like server.py:109-122;
  *   - `watch_source(watchsourceinfo) returns (status)` — C1 remote form
  *     (server.py:57-72): `srcinfo_json` parameters land in the
  *     WatchStore; replies `status(msg="added")` like the reference, or a
  *     gRPC INVALID_ARGUMENT status carrying the validation error;
  *   - `fetch_watchlist(empty) returns (watchlist)` — C2 (server.py:54-55):
  *     `pd_json` is a JSON-encoded STRING holding the columns-oriented
  *     watchlist JSON, the double encoding `json.dumps(df.to_json())`
  *     produces, so a reference client's
  *     `pd.read_json(json.loads(resp.pd_json))` round-trips.
  *
  * Runs on the grpc-java + netty the Spark distribution already ships for
  * Spark Connect (shaded under `org.sparkproject.connect.grpc`, the
  * `spark-connect` jar of any stock Spark 4 install) — zero new
  * dependencies, which is what the zero-egress build requires. Message
  * codecs are the same hand-rolled protobuf readers/writers the socket
  * framing uses (each message has at most two fields), so no generated
  * stubs either; methods are declared via [[MethodDescriptor]] with a raw
  * byte marshaller.
  *
  * The reference deprecated this surface as "much slower" than the raw
  * socket (server.py:27-32) and so do we: the socket framing remains the
  * rate path; gRPC exists so an unmodified reference CLI/client
  * (client.py:175-214) can point at this engine and work.
  */
class GrpcImageServer(port: Int, stream: ImageSocketMicroBatchStream) {
  import GrpcImageServer._

  private var server: Server = _

  def start(): Unit = {
    server = NettyServerBuilder.forPort(port)
      .addService(serviceDefinition())
      .build()
      .start()
  }

  def stop(): Unit = {
    if (server != null) {
      server.shutdownNow()
      server.awaitTermination(5, TimeUnit.SECONDS)
    }
  }

  private def serviceDefinition(): ServerServiceDefinition =
    ServerServiceDefinition.builder(ServiceName)
      .addMethod(FilterAndSave,
        ServerCalls.asyncUnaryCall(new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
          override def invoke(req: Array[Byte],
              resp: StreamObserver[Array[Byte]]): Unit = {
            try {
              stream.enqueueFrame(req)
              resp.onNext(Array.emptyByteArray) // empty{}
              resp.onCompleted()
            } catch {
              case e: Exception => resp.onError(Status.INVALID_ARGUMENT
                .withDescription(errMsg(e)).asRuntimeException())
            }
          }
        }))
      .addMethod(FilterAndSaveChunk,
        ServerCalls.asyncClientStreamingCall(
          new ServerCalls.ClientStreamingMethod[Array[Byte], Array[Byte]] {
            override def invoke(resp: StreamObserver[Array[Byte]])
                : StreamObserver[Array[Byte]] =
              new StreamObserver[Array[Byte]] {
                // reassembly state (server.py:109-122: header from the
                // first chunk, cube bytes concatenated in arrival order)
                private var header: Array[Byte] = null
                private val cube = new ArrayBuffer[Array[Byte]]()
                override def onNext(chunk: Array[Byte]): Unit = {
                  val (hdr, part) = parseChunk(chunk)
                  if (header == null && hdr != null && hdr.nonEmpty)
                    header = hdr
                  if (part.nonEmpty) cube += part
                }
                override def onError(t: Throwable): Unit = {} // client gone
                override def onCompleted(): Unit = {
                  try {
                    require(header != null,
                      "no chunk carried a header (field 1)")
                    stream.enqueueFrame(
                      epicImage(header, cube.toSeq))
                    resp.onNext(Array.emptyByteArray)
                    resp.onCompleted()
                  } catch {
                    case e: Exception => resp.onError(Status.INVALID_ARGUMENT
                      .withDescription(errMsg(e)).asRuntimeException())
                  }
                }
              }
          }))
      .addMethod(WatchSource,
        ServerCalls.asyncUnaryCall(new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
          override def invoke(req: Array[Byte],
              resp: StreamObserver[Array[Byte]]): Unit = {
            try {
              val srcinfo = stringField1(req)
              val reply = stream.handleWatch(
                normalizeWatchJson(srcinfo).getBytes(StandardCharsets.UTF_8))
              if (reply.contains("\"error\""))
                throw new IllegalArgumentException(reply)
              resp.onNext(stringMessage("added")) // status{msg}, server.py:72
              resp.onCompleted()
            } catch {
              case e: Exception => resp.onError(Status.INVALID_ARGUMENT
                .withDescription(errMsg(e)).asRuntimeException())
            }
          }
        }))
      .addMethod(FetchWatchlist,
        ServerCalls.asyncUnaryCall(new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
          override def invoke(req: Array[Byte],
              resp: StreamObserver[Array[Byte]]): Unit = {
            try {
              val rows = stream.handleFetchWatchlist()
              if (rows.startsWith("{\"error\""))
                throw new IllegalStateException(rows)
              // watchlist{pd_json}: json.dumps(df.to_json()) parity — the
              // columns-oriented pandas JSON, itself JSON-string-encoded
              resp.onNext(stringMessage(jsonQuote(toColumnsOrientJson(rows))))
              resp.onCompleted()
            } catch {
              case e: Exception => resp.onError(Status.INTERNAL
                .withDescription(errMsg(e)).asRuntimeException())
            }
          }
        }))
      .build()

  private def errMsg(e: Exception): String =
    Option(e.getMessage).getOrElse(e.getClass.getSimpleName).take(500)
}

object GrpcImageServer {
  val ServiceName = "epic_post_process"

  /** Raw-bytes marshaller: the hand-rolled codecs below do the proto work,
    * so generated stubs are unnecessary. */
  private val Bytes: MethodDescriptor.Marshaller[Array[Byte]] =
    new MethodDescriptor.Marshaller[Array[Byte]] {
      override def stream(value: Array[Byte]): InputStream =
        new ByteArrayInputStream(value)
      override def parse(in: InputStream): Array[Byte] = in.readAllBytes()
    }

  private def method(name: String, mt: MethodType)
      : MethodDescriptor[Array[Byte], Array[Byte]] =
    MethodDescriptor.newBuilder(Bytes, Bytes)
      .setFullMethodName(
        MethodDescriptor.generateFullMethodName(ServiceName, name))
      .setType(mt)
      .build()

  val FilterAndSave: MethodDescriptor[Array[Byte], Array[Byte]] =
    method("filter_and_save", MethodType.UNARY)
  val FilterAndSaveChunk: MethodDescriptor[Array[Byte], Array[Byte]] =
    method("filter_and_save_chunk", MethodType.CLIENT_STREAMING)
  val WatchSource: MethodDescriptor[Array[Byte], Array[Byte]] =
    method("watch_source", MethodType.UNARY)
  val FetchWatchlist: MethodDescriptor[Array[Byte], Array[Byte]] =
    method("fetch_watchlist", MethodType.UNARY)

  // ---- tiny protobuf codecs (proto3, wire format only) -----------------

  /** varint at pos; returns (value, next pos). */
  private def varint(b: Array[Byte], pos0: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var pos = pos0; var more = true
    while (more) {
      require(pos < b.length && shift < 64, "truncated varint")
      val x = b(pos)
      v |= (x & 0x7FL) << shift
      shift += 7; pos += 1
      more = (x & 0x80) != 0
    }
    (v, pos)
  }

  /** Lenient `epic_image` chunk parse: either field may be absent (proto3
    * omits empty fields — trailing chunks carry no header). Returns
    * (header bytes or null, cube bytes, possibly empty). */
  private[sources] def parseChunk(payload: Array[Byte])
      : (Array[Byte], Array[Byte]) = {
    var pos = 0
    var header: Array[Byte] = null
    var cube: Array[Byte] = Array.emptyByteArray
    while (pos < payload.length) {
      val (tag, p1) = varint(payload, pos); pos = p1
      val field = (tag >>> 3).toInt
      (tag & 7L) match {
        case 2L =>
          val (len, p2) = varint(payload, pos); pos = p2
          require(len >= 0 && pos + len <= payload.length,
            s"truncated field $field")
          val part = java.util.Arrays.copyOfRange(payload, pos, pos + len.toInt)
          field match {
            case 1 => header = part
            case 2 => cube = part
            case _ => // unknown: skip
          }
          pos += len.toInt
        case 0L => val (_, p2) = varint(payload, pos); pos = p2
        case 5L => pos += 4
        case 1L => pos += 8
        case other => throw new IllegalArgumentException(
          s"unsupported wire type $other (field $field)")
      }
    }
    (header, cube)
  }

  private def varintLen(v: Long): Int = {
    var n = 1; var x = v >>> 7
    while (x != 0) { n += 1; x >>>= 7 }
    n
  }

  private def putVarint(out: java.nio.ByteBuffer, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.put(((v & 0x7F) | 0x80).toByte); v >>>= 7
    }
    out.put(v.toByte)
  }

  /** Serialize one `epic_image` message from a header and cube parts —
    * the chunk-reassembly output, byte-compatible with what a one-shot
    * producer would have sent. */
  private[sources] def epicImage(header: Array[Byte],
      cubeParts: Seq[Array[Byte]]): Array[Byte] = {
    val cubeLen = cubeParts.iterator.map(_.length.toLong).sum
    require(cubeLen <= Int.MaxValue - 16, s"cube too large: $cubeLen")
    val out = java.nio.ByteBuffer.allocate(
      1 + varintLen(header.length) + header.length +
        1 + varintLen(cubeLen) + cubeLen.toInt)
    out.put(0x0A.toByte); putVarint(out, header.length) // field 1
    out.put(header)
    out.put(0x12.toByte); putVarint(out, cubeLen)       // field 2
    cubeParts.foreach(out.put)
    out.array()
  }

  /** `epic_image` trailing chunk: cube bytes only — proto3 omits the empty
    * header field, exactly what the reference's chunk_data yields for
    * i > 0 (client.py:79-84). */
  private[sources] def cubeOnlyMessage(part: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(
      1 + varintLen(part.length) + part.length)
    out.put(0x12.toByte); putVarint(out, part.length) // field 2
    out.put(part)
    out.array()
  }

  /** One-string-field message (status{msg}, watchlist{pd_json},
    * watchsourceinfo{srcinfo_json} all share the shape). */
  private[sources] def stringMessage(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val out = java.nio.ByteBuffer.allocate(1 + varintLen(b.length) + b.length)
    out.put(0x0A.toByte); putVarint(out, b.length)
    out.put(b)
    out.array()
  }

  /** Field 1 of a one-string-field message ("" when absent, like proto3). */
  private[sources] def stringField1(payload: Array[Byte]): String = {
    val (hdr, _) = parseChunk(payload)
    if (hdr == null) "" else new String(hdr, StandardCharsets.UTF_8)
  }

  /** The reference's srcinfo_json carries numeric ra/dec and an int
    * patch_type (client.py:175-214); the WatchStore handler wants its
    * strings ("5" parses via EpicPipeline.patchSize). Jackson's asText
    * handles the numbers; this normalizes patch_type only. */
  private def normalizeWatchJson(srcinfo: String): String = {
    val mapper = ImageFrameDecoder.mapper
    val node = mapper.readTree(srcinfo)
    node match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode
          if o.hasNonNull("patch_type") && o.get("patch_type").isNumber =>
        o.put("patch_type", o.get("patch_type").asText())
        mapper.writeValueAsString(o)
      case _ => srcinfo
    }
  }

  /** Pivot a JSON array of row objects (the socket watchlist reply) into
    * pandas columns-oriented JSON: {"col": {"0": v0, "1": v1, …}, …} —
    * what `df.to_json()` emits. Column order follows the first row. */
  private[sources] def toColumnsOrientJson(rowsJson: String): String = {
    val mapper = ImageFrameDecoder.mapper
    val rows = mapper.readTree(rowsJson)
    require(rows.isArray, s"expected a JSON array: $rowsJson")
    val out = mapper.createObjectNode()
    if (rows.size() > 0) {
      val it = rows.get(0).fieldNames()
      while (it.hasNext) {
        val colName = it.next()
        val col = mapper.createObjectNode()
        (0 until rows.size()).foreach { i =>
          // explicit type param: ObjectNode.set[T <: JsonNode] returns T
          // and Scala infers Nothing without it (a ClassCastException)
          col.set[com.fasterxml.jackson.databind.JsonNode](
            i.toString, rows.get(i).get(colName))
        }
        out.set[com.fasterxml.jackson.databind.JsonNode](colName, col)
      }
    }
    mapper.writeValueAsString(out)
  }

  /** JSON string-encode (the outer `json.dumps` of the double encoding). */
  private[sources] def jsonQuote(s: String): String =
    ImageFrameDecoder.mapper.writeValueAsString(s)
}
