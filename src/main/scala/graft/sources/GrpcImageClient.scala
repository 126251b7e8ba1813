package graft.sources

import java.nio.charset.StandardCharsets
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

import org.sparkproject.connect.grpc.{CallOptions, ManagedChannel}
import org.sparkproject.connect.grpc.netty.NettyChannelBuilder
import org.sparkproject.connect.grpc.stub.{ClientCalls, StreamObserver}

/** Producer-side twin of [[GrpcImageServer]] — the reference's
  * `EpicRPCClient` surface (epic_services/client.py:31-214) against any
  * `epic_post_process` endpoint. Like [[ImageSocketClient]] this is
  * test-harness / producer tooling, not engine dataflow; it exists so the
  * e2e spec exercises the server over a REAL gRPC channel (same shaded
  * grpc-java the server runs on).
  */
object GrpcImageClient {
  import GrpcImageServer.{epicImage, stringField1, stringMessage}

  private def withChannel[A](host: String, port: Int)(f: ManagedChannel => A): A = {
    val ch = NettyChannelBuilder.forAddress(host, port).usePlaintext().build()
    try f(ch)
    finally {
      ch.shutdownNow()
      ch.awaitTermination(5, TimeUnit.SECONDS)
    }
  }

  /** Unary `filter_and_save`: one serialized `epic_image` message. */
  def filterAndSave(host: String, port: Int, message: Array[Byte]): Unit =
    withChannel(host, port) { ch =>
      ClientCalls.blockingUnaryCall(ch, GrpcImageServer.FilterAndSave,
        CallOptions.DEFAULT, message)
    }

  /** `chunk_data` parity (client.py:66-84): split cube bytes at
    * `chunkSize`, JSON header list string on the FIRST chunk only, one
    * `epic_image` message per chunk. `chunkSize` is in cube BYTES (the
    * reference slices the flat ndarray, so elements × itemsize). */
  def chunkData(headerJson: String, cube: Array[Byte],
      chunkSize: Int = 1 << 16): Seq[Array[Byte]] = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    val hdr = headerJson.getBytes(StandardCharsets.UTF_8)
    val ranges = 0 until cube.length by chunkSize
    if (ranges.isEmpty) Seq(epicImage(hdr, Nil))
    else ranges.map { off =>
      val part = java.util.Arrays.copyOfRange(cube, off,
        math.min(off + chunkSize, cube.length))
      if (off == 0) epicImage(hdr, Seq(part))
      else GrpcImageServer.cubeOnlyMessage(part)
    }
  }

  /** Client-streaming `filter_and_save_chunk`: stream the chunk messages,
    * await the server's `empty` reply (or propagate its status error). */
  def filterAndSaveChunk(host: String, port: Int,
      chunks: Seq[Array[Byte]]): Unit =
    withChannel(host, port) { ch =>
      val done = new CountDownLatch(1)
      val err = new AtomicReference[Throwable](null)
      val respObs = new StreamObserver[Array[Byte]] {
        override def onNext(v: Array[Byte]): Unit = {}
        override def onError(t: Throwable): Unit = {
          err.set(t); done.countDown()
        }
        override def onCompleted(): Unit = done.countDown()
      }
      val reqObs = ClientCalls.asyncClientStreamingCall(
        ch.newCall(GrpcImageServer.FilterAndSaveChunk, CallOptions.DEFAULT),
        respObs)
      chunks.foreach(reqObs.onNext)
      reqObs.onCompleted()
      require(done.await(60, TimeUnit.SECONDS), "filter_and_save_chunk timed out")
      if (err.get() != null) throw new RuntimeException(err.get())
    }

  /** `watch_source`: srcinfo JSON in, `status.msg` back. */
  def watchSource(host: String, port: Int, srcinfoJson: String): String =
    withChannel(host, port) { ch =>
      stringField1(ClientCalls.blockingUnaryCall(ch,
        GrpcImageServer.WatchSource, CallOptions.DEFAULT,
        stringMessage(srcinfoJson)))
    }

  /** `fetch_watchlist`: returns the raw `pd_json` field (the
    * `json.dumps(df.to_json())` double-encoded string). */
  def fetchWatchlist(host: String, port: Int): String =
    withChannel(host, port) { ch =>
      stringField1(ClientCalls.blockingUnaryCall(ch,
        GrpcImageServer.FetchWatchlist, CallOptions.DEFAULT,
        Array.emptyByteArray))
    }
}
