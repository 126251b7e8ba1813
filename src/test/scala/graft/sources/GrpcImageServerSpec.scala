package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.epic.ImageFixtures

/** End-to-end test of the gRPC surface (S2): a real grpc-java channel
  * carries all four `epic_post_process` RPCs against the streaming source —
  * unary ingest, chunked client-streaming ingest (the reference's
  * `chunk_data` framing), watch management, and the watchlist fetch. */
class GrpcImageServerSpec extends SparkSpec {

  private def protoFrame(dt: String): Array[Byte] =
    ImageSocketClient.encodeProto(
      ImageFixtures.primaryHeader,
      ImageFixtures.imgHeader(dt, s"EPIC_$dt.fits"),
      Seq(2, ImageFixtures.NPol, ImageFixtures.NChan,
        ImageFixtures.YDim, ImageFixtures.XDim),
      ImageFixtures.cube())

  test("all four RPCs work end-to-end over a live gRPC channel") {
    val dir = Files.createTempDirectory("epicgrpc").toString
    val sock = s"$dir/epic.sock"
    val wl = s"$dir/wl"
    val out = s"$dir/out"
    val grpcPort = 19000 + scala.util.Random.nextInt(2000)

    val images = spark.readStream.format("epic-socket")
      .option("path", sock)
      .option("grpcPort", grpcPort.toString)
      .option("watchStorePath", wl)
      .load()
    val q = images
      .select(element_at(col("img_hdr"), "DATETIME").as("dt"),
        size(col("image")).as("n"))
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    Thread.sleep(700)

    try {
      // C1 over gRPC: watch_source returns the reference's exact reply
      val msg = GrpcImageClient.watchSource("127.0.0.1", grpcPort,
        """{"source_name":"grpc_src","ra":180.0,"dec":34.0,""" +
          """"patch_type":5,"author":"batman"}""")
      assert(msg == "added", msg)

      // invalid watch → grpc status error, server keeps serving
      val dup = intercept[Exception] {
        GrpcImageClient.watchSource("127.0.0.1", grpcPort,
          """{"source_name":"grpc_src","ra":180.0,"dec":34.0}""")
      }
      assert(dup.getMessage.contains("already being watched"), dup.getMessage)

      // C2 over gRPC: pd_json double-encoding — json.loads yields the
      // columns-oriented frame with our row in it
      val pdJson = GrpcImageClient.fetchWatchlist("127.0.0.1", grpcPort)
      val once = ImageFrameDecoder.mapper.readTree(pdJson)
      assert(once.isTextual, s"outer layer should be a JSON string: $pdJson")
      val frame = ImageFrameDecoder.mapper.readTree(once.asText())
      assert(frame.get("source_name").get("0").asText() == "grpc_src", frame)
      assert(frame.get("patch_type").get("0").asText() == "5", frame)

      // unary ingest: the serialized epic_image message as one request
      GrpcImageClient.filterAndSave("127.0.0.1", grpcPort,
        protoFrame("2022-08-31T23:29:10.000000"))

      // chunked ingest: split the 256 KiB fixture cube into 64 KiB chunks
      // (the reference default, 1<<16 — client.py:28)
      val whole = protoFrame("2022-08-31T23:29:11.000000")
      val (hdrBytes, cube) = {
        val (h, off, len) = ImageFrameDecoder.parseProto(whole)
        (h, java.util.Arrays.copyOfRange(whole, off, off + len))
      }
      val chunks = GrpcImageClient.chunkData(hdrBytes, cube,
        chunkSize = 1 << 16)
      assert(chunks.length > 1, s"expected >1 chunk, got ${chunks.length}")
      GrpcImageClient.filterAndSaveChunk("127.0.0.1", grpcPort, chunks)

      // both frames decode to full-size rows in the stream
      val deadline = System.currentTimeMillis() + 120000
      def rows(): Long =
        try spark.read.parquet(s"$out/rows").count()
        catch { case _: Exception => 0L }
      while (rows() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      assert(rows() == 2)
      val r = spark.read.parquet(s"$out/rows").orderBy("dt").collect()
      assert(r.map(_.getString(0)).toSeq == Seq(
        "2022-08-31T23:29:10.000000", "2022-08-31T23:29:11.000000"))
      assert(r.forall(_.getInt(1) ==
        2 * ImageFixtures.NPol * ImageFixtures.NChan *
          ImageFixtures.YDim * ImageFixtures.XDim))
    } finally q.stop()
  }

  test("chunk reassembly is byte-exact: split + reassemble = original") {
    val whole = protoFrame("2022-08-31T23:29:12.000000")
    val (h, off, len) = ImageFrameDecoder.parseProto(whole)
    val cube = java.util.Arrays.copyOfRange(whole, off, off + len)
    val chunks = GrpcImageClient.chunkData(h, cube, chunkSize = 65536)
    // server-side reassembly (the onCompleted path)
    var header: Array[Byte] = null
    val parts = Seq.newBuilder[Array[Byte]]
    chunks.foreach { c =>
      val (hd, part) = GrpcImageServer.parseChunk(c)
      if (header == null && hd != null && hd.nonEmpty) header = hd
      if (part.nonEmpty) parts += part
    }
    val rebuilt = GrpcImageServer.epicImage(header, parts.result())
    assert(java.util.Arrays.equals(rebuilt, whole),
      "reassembled message differs from the original")
  }
}
