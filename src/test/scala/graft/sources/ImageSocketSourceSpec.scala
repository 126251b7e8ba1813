package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.epic.ImageFixtures

/** End-to-end test of the custom MicroBatchStream: a client thread streams
  * framed image cubes over a Unix socket; the streaming query decodes them
  * and runs a header projection. */
class ImageSocketSourceSpec extends SparkSpec {

  private def frame(dt: String): Array[Byte] =
    ImageSocketClient.encode(
      ImageFixtures.primaryHeader,
      ImageFixtures.imgHeader(dt, s"EPIC_$dt.fits"),
      Seq(2, ImageFixtures.NPol, ImageFixtures.NChan,
        ImageFixtures.YDim, ImageFixtures.XDim),
      ImageFixtures.cube())

  test("frames stream through handshake, decode, and a downstream plan") {
    val sock = Files.createTempDirectory("epicsock").toString + "/epic.sock"
    val out = Files.createTempDirectory("epicout").toString

    val images = spark.readStream.format("epic-socket")
      .option("path", sock).load()
    val q = images
      .select(element_at(col("img_hdr"), "DATETIME").as("dt"),
        col("dtype"), size(col("image")).as("n"),
        col("shape"))
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()

    // wait for the server socket, then stream 3 frames from a client thread
    Thread.sleep(500)
    ImageSocketClient.sendUds(sock, frame("2022-08-31T23:29:10.000000"))
    ImageSocketClient.sendUds(sock, frame("2022-08-31T23:29:11.000000"),
      chunkSize = 819200) // the reference's tuned chunk size
    ImageSocketClient.sendUds(sock, frame("2022-08-31T23:29:12.000000"))

    val deadline = System.currentTimeMillis() + 120000
    def rows(): Long =
      try spark.read.parquet(s"$out/rows").count()
      catch { case _: Exception => 0L }
    while (rows() < 3 && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.stop()

    val got = spark.read.parquet(s"$out/rows")
    assert(got.count() == 3)
    val r = got.orderBy("dt").collect()
    assert(r.map(_.getString(0)).toSeq == Seq(
      "2022-08-31T23:29:10.000000", "2022-08-31T23:29:11.000000",
      "2022-08-31T23:29:12.000000"))
    assert(r.forall(_.getString(1) == "float32"))
    assert(r.forall(_.getInt(2) == 2 * 2 * 4 * 64 * 64))
  }

  test("TCP transport (the gRPC-replacement remote endpoint) also streams") {
    val out = Files.createTempDirectory("epictcp").toString
    val port = 18000 + scala.util.Random.nextInt(2000)
    val images = spark.readStream.format("epic-socket")
      .option("family", "tcp").option("host", "127.0.0.1")
      .option("port", port.toString).load()
    val q = images
      .select(element_at(col("img_hdr"), "DATETIME").as("dt"))
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    Thread.sleep(500)
    ImageSocketClient.sendTcp("127.0.0.1", port,
      frame("2022-08-31T23:29:10.000000"))
    val deadline = System.currentTimeMillis() + 120000
    def rows(): Long =
      try spark.read.parquet(s"$out/rows").count()
      catch { case _: Exception => 0L }
    while (rows() < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.stop()
    assert(rows() == 1)
  }

  test("watch_source RPC over the live socket joins the next micro-batch") {
    val dir = Files.createTempDirectory("epicwatch").toString
    val sock = s"$dir/epic.sock"
    val wl = s"$dir/wl"
    val out = s"$dir/out"
    val store = new graft.epic.WatchStore(spark, wl)
    val images = spark.readStream.format("epic-socket")
      .option("path", sock).option("watchStorePath", wl).load()
    val q = graft.epic.EpicStreaming.start(images, store, out, s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("200 milliseconds"))
    Thread.sleep(500)
    // remote add over the SAME socket the images flow through
    // (uds_server.py:122-137 processor dispatch)
    val reply = ImageSocketClient.sendWatchUds(sock,
      """{"source_name":"center","ra":"180.0","dec":"34.0",""" +
        """"patch_type":"3x3"}""")
    assert(reply == """{"id":1}""", reply)
    assert(store.watchlist().select("source_name").collect()
      .map(_.getString(0)).toSeq == Seq("center"))
    // duplicate guard travels back as a JSON error, server keeps serving
    val dup = ImageSocketClient.sendWatchUds(sock,
      """{"source_name":"center","ra":"180.0","dec":"34.0"}""")
    assert(dup.contains("error") && dup.contains("already being watched"))
    // the watch added mid-stream takes effect: next frame yields its 3x3
    ImageSocketClient.sendUds(sock, frame("2022-08-31T23:29:10.000000"))
    val deadline = System.currentTimeMillis() + 120000
    def cnt(p: String): Long =
      try spark.read.parquet(s"$out/$p").count()
      catch { case _: Exception => 0L }
    // wait for BOTH sinks: stop() between the two appends would otherwise
    // strand the batch half-written
    while ((cnt("epic_pixels") < 9 || cnt("epic_img_metadata") < 1) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.stop()
    assert(cnt("epic_pixels") == 9)
    assert(cnt("epic_img_metadata") == 1)
  }

  test("decode=binary streams blob frames through the full pixel pipeline") {
    val dir = Files.createTempDirectory("epicbin").toString
    val sock = s"$dir/epic.sock"
    val wl = s"$dir/wl"
    val out = s"$dir/out"
    val store = new graft.epic.WatchStore(spark, wl)
    store.addWatch("center", "180.0", "34.0")
    // binary passthrough: the source emits imageBinarySchema and the
    // gather reads the blob natively — no per-frame array assembly
    val images = spark.readStream.format("epic-socket")
      .option("path", sock).option("decode", "binary").load()
    assert(images.schema("image").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val q = graft.epic.EpicStreaming.start(images, store, out, s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("200 milliseconds"))
    Thread.sleep(500)
    ImageSocketClient.sendUds(sock, frame("2022-08-31T23:29:10.000000"))
    val deadline = System.currentTimeMillis() + 120000
    def cnt(p: String): Long =
      try spark.read.parquet(s"$out/$p").count()
      catch { case _: Exception => 0L }
    while ((cnt("epic_pixels") < 9 || cnt("epic_img_metadata") < 1) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.stop()
    assert(cnt("epic_pixels") == 9)
    // exact-value check: same numbers as the array path would produce
    // (cube value at plane k, y, x is k·100000 + y·64 + x; center pixel
    // of the 3x3 patch is 0-based (32,32))
    val center = spark.read.parquet(s"$out/epic_pixels")
      .where(col("pix_ofst_x") === 0 && col("pix_ofst_y") === 0)
      .select("pixel_values").head().getSeq[Double](0)
    assert(center.length == 2 * 2 * 4)
    assert(center.head == (32 * 64 + 32).toDouble)
    assert(center(1) == (100000 + 32 * 64 + 32).toDouble)
  }

  test("fetch_watchlist RPC returns the active watchlist over the socket") {
    val dir = Files.createTempDirectory("epicfetch").toString
    val sock = s"$dir/epic.sock"
    val wl = s"$dir/wl"
    val images = spark.readStream.format("epic-socket")
      .option("path", sock).option("watchStorePath", wl).load()
    val q = images.select(col("dtype"))
      .writeStream.format("parquet")
      .option("path", s"$dir/rows").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    Thread.sleep(500)
    // empty store: empty JSON array
    assert(ImageSocketClient.fetchWatchlistUds(sock) == "[]")
    // add two watches via RPC, then fetch via RPC — rows must match the
    // local watchlistJson() view
    ImageSocketClient.sendWatchUds(sock,
      """{"source_name":"crab","ra":"83.6","dec":"22.0"}""")
    ImageSocketClient.sendWatchUds(sock,
      """{"source_name":"cyga","ra":"299.9","dec":"40.7"}""")
    val fetched = ImageSocketClient.fetchWatchlistUds(sock)
    val local = new graft.GraftEngine(spark, wl).watchlistJson()
    assert(fetched == local.mkString("[", ",", "]"), fetched)
    assert(fetched.contains("\"crab\"") && fetched.contains("\"cyga\""))
    q.stop()
  }

  test("handshake fragmented across two TCP writes still goes through") {
    val dir = Files.createTempDirectory("epicfrag").toString
    val sock = s"$dir/epic.sock"
    val images = spark.readStream.format("epic-socket")
      .option("path", sock).load()
    val q = images.select(col("dtype"))
      .writeStream.format("parquet")
      .option("path", s"$dir/rows").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    Thread.sleep(500)
    // hand-rolled client that splits the handshake JSON mid-token: the
    // server must accumulate, not fail the parse on the first fragment
    val payload = frame("2022-08-31T23:29:10.000000")
    val ch = java.nio.channels.SocketChannel.open(
      java.net.StandardProtocolFamily.UNIX)
    ch.connect(java.net.UnixDomainSocketAddress.of(sock))
    val hs = s"""["epic_image", ${payload.length}]"""
      .getBytes("UTF-8")
    ch.write(java.nio.ByteBuffer.wrap(hs, 0, 10))
    Thread.sleep(200) // force two distinct reads server-side
    ch.write(java.nio.ByteBuffer.wrap(hs, 10, hs.length - 10))
    val reply = java.nio.ByteBuffer.allocate(7)
    while (reply.hasRemaining) assert(ch.read(reply) > 0)
    assert(new String(reply.array(), "UTF-8") == "proceed")
    ch.write(java.nio.ByteBuffer.wrap(payload))
    val deadline = System.currentTimeMillis() + 120000
    def rows(): Long =
      try spark.read.parquet(s"$dir/rows").count()
      catch { case _: Exception => 0L }
    while (rows() < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    ch.close()
    q.stop()
    assert(rows() == 1)
  }

  private def protoFrame(dt: String): Array[Byte] =
    ImageSocketClient.encodeProto(
      ImageFixtures.primaryHeader,
      ImageFixtures.imgHeader(dt, s"EPIC_$dt.fits"),
      Seq(2, ImageFixtures.NPol, ImageFixtures.NChan,
        ImageFixtures.YDim, ImageFixtures.XDim),
      ImageFixtures.cube())

  test("protobuf epic_image framing decodes to the same rows as the JSON " +
      "layout (wire parity with the reference producer)") {
    val dt = "2022-08-31T23:29:10.000000"
    val viaProto = ImageFrameDecoder.decode(protoFrame(dt))
    val viaJson = ImageFrameDecoder.decode(frame(dt))
    // same arity, same cube, same dtype/shape
    assert(viaProto.numFields == viaJson.numFields)
    assert(viaProto.getString(2) == viaJson.getString(2))
    assert(viaProto.getArray(3).toIntArray().toSeq ==
      viaJson.getArray(3).toIntArray().toSeq)
    assert(viaProto.getArray(4).toFloatArray().toSeq ==
      viaJson.getArray(4).toFloatArray().toSeq)
    // header maps carry the same keys and values (FITS cards round-trip)
    def toMap(r: org.apache.spark.sql.catalyst.InternalRow, i: Int) = {
      val m = r.getMap(i)
      (0 until m.numElements()).map(j =>
        m.keyArray().getUTF8String(j).toString ->
          m.valueArray().getUTF8String(j).toString).toMap
    }
    assert(toMap(viaProto, 0) == toMap(viaJson, 0))
    assert(toMap(viaProto, 1) == toMap(viaJson, 1))
    // and the binary-passthrough decode agrees too
    val binProto = ImageFrameDecoder.decodeBinary(protoFrame(dt))
    val binJson = ImageFrameDecoder.decodeBinary(frame(dt))
    assert(java.util.Arrays.equals(binProto.getBinary(4),
      binJson.getBinary(4)))
  }

  test("protobuf frames stream end-to-end through the live socket") {
    val sock = Files.createTempDirectory("epicproto").toString + "/epic.sock"
    val out = Files.createTempDirectory("epicprotoout").toString
    val images = spark.readStream.format("epic-socket")
      .option("path", sock).load()
    val q = images
      .select(element_at(col("img_hdr"), "DATETIME").as("dt"),
        size(col("image")).as("n"))
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    Thread.sleep(500)
    // one protobuf frame and one JSON frame interleaved on the same socket
    ImageSocketClient.sendUds(sock, protoFrame("2022-08-31T23:29:10.000000"))
    ImageSocketClient.sendUds(sock, frame("2022-08-31T23:29:11.000000"))
    val deadline = System.currentTimeMillis() + 120000
    def rows(): Long =
      try spark.read.parquet(s"$out/rows").count()
      catch { case _: Exception => 0L }
    while (rows() < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.stop()
    val got = spark.read.parquet(s"$out/rows").orderBy("dt").collect()
    assert(got.length == 2)
    assert(got.map(_.getString(0)).toSeq == Seq(
      "2022-08-31T23:29:10.000000", "2022-08-31T23:29:11.000000"))
    assert(got.forall(_.getInt(1) == 2 * 2 * 4 * 64 * 64))
  }

  test("FITS card parser handles quoted strings, '' escapes, comments") {
    val cards =
      ("SIMPLE  =                    T / conforms to FITS standard          " +
        "        ").padTo(80, ' ') +
      ("OBJECT  = 'O''NEIL  '          / quoted with escape                 " +
        "        ").padTo(80, ' ') +
      ("CRVAL1  =                180.0 / [deg]                              " +
        "        ").padTo(80, ' ') +
      "COMMENT this is ignored".padTo(80, ' ') +
      "END".padTo(80, ' ')
    val m = ImageFrameDecoder.fitsCards(cards)
    val parsed = (0 until m.numElements()).map(j =>
      m.keyArray.getUTF8String(j).toString ->
        m.valueArray.getUTF8String(j).toString).toMap
    assert(parsed == Map("SIMPLE" -> "T", "OBJECT" -> "O'NEIL",
      "CRVAL1" -> "180.0"))
  }

  test("protobuf integrity check rejects a truncated cube") {
    val bad = ImageSocketClient.encodeProto(
      ImageFixtures.primaryHeader,
      ImageFixtures.imgHeader("2022-08-31T23:29:10.000000", "f.fits"),
      Seq(2, 2, 4, 64, 64),
      new Array[Float](100))
    val e = intercept[IllegalArgumentException] {
      ImageFrameDecoder.decode(bad)
    }
    assert(e.getMessage.contains("integrity check failed"))
  }

  test("integrity check rejects a frame whose size != prod(shape)") {
    val bad = ImageSocketClient.encode(
      ImageFixtures.primaryHeader,
      ImageFixtures.imgHeader("2022-08-31T23:29:10.000000", "f.fits"),
      Seq(2, 2, 4, 64, 64),
      new Array[Float](100)) // truncated cube
    val e = intercept[IllegalArgumentException] {
      ImageFrameDecoder.decode(bad)
    }
    assert(e.getMessage.contains("integrity check failed"))
  }

  test("concurrent watch RPCs serialize: no adds lost, ids unique") {
    val dir = Files.createTempDirectory("epicconc").toString
    val sock = s"$dir/epic.sock"
    val wl = s"$dir/wl"
    val images = spark.readStream.format("epic-socket")
      .option("path", sock).option("watchStorePath", wl).load()
    val q = images.select(col("dtype"))
      .writeStream.format("parquet")
      .option("path", s"$dir/rows").option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    Thread.sleep(500)
    // 6 adds from 6 client threads at once — the store's per-path lock
    // must serialize the read-union-write cycles (a lost update here
    // would silently drop a watch)
    val threads = (1 to 6).map { i =>
      val t = new Thread(() => {
        val r = ImageSocketClient.sendWatchUds(sock,
          s"""{"source_name":"src_$i","ra":"${100 + i}.0","dec":"10.0"}""")
        assert(r.startsWith("""{"id":"""), r)
      })
      t.start(); t
    }
    threads.foreach(_.join(30000))
    q.stop()
    val store = new graft.epic.WatchStore(spark, wl)
    val rows = store.listAll().collect()
    assert(rows.length == 6, s"lost adds: only ${rows.length}/6 present")
    assert(rows.map(_.getAs[Long]("id")).toSet.size == 6, "duplicate ids")
    assert(rows.map(_.getAs[String]("source_name")).toSet ==
      (1 to 6).map(i => s"src_$i").toSet)
  }

  test("durable mode: partitions carry spill paths, never payload bytes") {
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files => JFiles, Paths}
    val dir = Files.createTempDirectory("epicspill").toString
    val sock = s"$dir/epic.sock"
    val stream = new ImageSocketMicroBatchStream(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("path" -> sock, "spillDir" -> s"$dir/frames").asJava))
    try {
      Thread.sleep(300)
      ImageSocketClient.sendUds(sock, frame("2022-08-31T23:29:10.000000"))
      ImageSocketClient.sendUds(sock, frame("2022-08-31T23:29:11.000000"))
      val deadline = System.currentTimeMillis() + 10000
      while (stream.latestOffset().asInstanceOf[FrameOffset].n < 2 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val parts = stream.planInputPartitions(FrameOffset(0),
        stream.latestOffset())
      assert(parts.length == 2)
      // the whole point: tasks ship a reference, not multi-MB frame bytes
      parts.foreach { p =>
        val fp = p.asInstanceOf[FramePartition]
        assert(fp.payload == null, "durable partition must not carry bytes")
        assert(fp.path != null && JFiles.exists(Paths.get(fp.path)))
      }
      // executor-side decode straight from the spill file
      val reader = stream.createReaderFactory().createReader(parts(0))
      assert(reader.next())
      assert(reader.get().numFields == 5)
      // commit = processed: spilled files are reclaimed
      stream.commit(stream.latestOffset())
      parts.foreach(p => assert(!JFiles.exists(
        Paths.get(p.asInstanceOf[FramePartition].path))))
    } finally stream.stop()
  }

  test("garbage handshake closes the connection; server keeps serving") {
    val sock = Files.createTempDirectory("epicbad").toString + "/epic.sock"
    val out = Files.createTempDirectory("epicbadout").toString
    val images = spark.readStream.format("epic-socket")
      .option("path", sock).load()
    val q = images.select(col("dtype"))
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    Thread.sleep(500)
    // a client that speaks nonsense: server must drop it, not die
    val ch = java.nio.channels.SocketChannel.open(
      java.net.StandardProtocolFamily.UNIX)
    ch.connect(java.net.UnixDomainSocketAddress.of(sock))
    ch.write(java.nio.ByteBuffer.wrap(
      "NOT JSON AT ALL".getBytes("UTF-8")))
    ch.close()
    // a well-formed frame afterwards still goes through
    ImageSocketClient.sendUds(sock, frame("2022-08-31T23:29:10.000000"))
    val deadline = System.currentTimeMillis() + 120000
    def rows(): Long =
      try spark.read.parquet(s"$out/rows").count()
      catch { case _: Exception => 0L }
    while (rows() < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.stop()
    assert(rows() == 1)
  }
}
