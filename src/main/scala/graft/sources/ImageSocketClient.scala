package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.{Channels, SocketChannel}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** Producer-side framing (S4 — the analog of the reference's
  * uds_client.py:45-98 / client.py:66-84 chunking client): serializes one
  * image record and streams it through the two-phase handshake in
  * `chunkSize` writes (reference default 2^16, tuned 819200). */
object ImageSocketClient {

  private val mapper = new ObjectMapper()

  /** Build the wire payload: 4-byte BE header length · JSON triplet ·
    * float32 LE cube. */
  def encode(primaryHdr: Map[String, String], imgHdr: Map[String, String],
      shape: Seq[Int], image: Array[Float]): Array[Byte] = {
    val arr = mapper.createArrayNode()
    def obj(m: Map[String, String]) = {
      val o = mapper.createObjectNode()
      m.foreach { case (k, v) => o.put(k, v) }
      o
    }
    arr.add(obj(primaryHdr))
    arr.add(obj(imgHdr))
    val meta = mapper.createObjectNode()
    meta.put("dtype", "float32")
    val shapeArr = mapper.createArrayNode()
    shape.foreach(shapeArr.add)
    meta.set[com.fasterxml.jackson.databind.JsonNode]("shape", shapeArr)
    arr.add(meta)
    val header = mapper.writeValueAsBytes(arr)

    val out = ByteBuffer.allocate(4 + header.length + image.length * 4)
    out.putInt(header.length)
    out.put(header)
    val fb = out.slice().order(ByteOrder.LITTLE_ENDIAN)
    image.foreach(fb.putFloat)
    out.array()
  }

  /** Build the protobuf `epic_image` wire payload — byte-compatible with
    * the reference producer (uds_client.py:87-98: `epic_image(header=hdr,
    * image_cube=data.tobytes()).SerializeToString()`). `header` is the
    * JSON list [primary FITS string, image FITS string, metadata JSON
    * string] with Python's `json.dumps` default separators, the two
    * headers rendered as 80-char FITS card runs (astropy
    * `Header.tostring()` layout). */
  def encodeProto(primaryHdr: Map[String, String], imgHdr: Map[String, String],
      shape: Seq[Int], image: Array[Float]): Array[Byte] = {
    val strides = shape.scanRight(4L)((d, acc) => acc * d).tail
    val meta = s"""{"dtype": "float32", "shape": [${shape.mkString(", ")}],""" +
      s""" "strides": [${strides.mkString(", ")}]}"""
    def jstr(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val header = "[" + Seq(fitsString(primaryHdr), fitsString(imgHdr), meta)
      .map(jstr).mkString(", ") + "]"
    val headerBytes = header.getBytes(StandardCharsets.UTF_8)
    val cube = ByteBuffer.allocate(image.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    image.foreach(cube.putFloat)

    def varintLen(v: Long): Int = {
      var n = 1; var x = v >>> 7
      while (x != 0) { n += 1; x >>>= 7 }
      n
    }
    val out = ByteBuffer.allocate(
      1 + varintLen(headerBytes.length) + headerBytes.length +
        1 + varintLen(image.length * 4) + image.length * 4)
    def putVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) {
        out.put(((v & 0x7F) | 0x80).toByte); v >>>= 7
      }
      out.put(v.toByte)
    }
    out.put(0x0A.toByte); putVarint(headerBytes.length) // field 1: header
    out.put(headerBytes)
    out.put(0x12.toByte); putVarint(image.length * 4)   // field 2: image_cube
    out.put(cube.array())
    out.array()
  }

  /** Render a key→value map as a FITS header string: 80-char cards,
    * `KEYWORD = value`, strings quoted ('' escapes '), END card, padded
    * with blanks to a 2880-byte block like astropy's `tostring()`. */
  def fitsString(m: Map[String, String]): String = {
    def numeric(v: String) =
      v.nonEmpty && v.matches("[+-]?[0-9]+(\\.[0-9]*)?([eE][+-]?[0-9]+)?")
    val cards = m.map { case (k, v) =>
      require(k.length <= 8, s"FITS keyword too long: $k")
      require(v.length <= 67, s"FITS value too long for one card: $v")
      val value =
        if (numeric(v) || v == "T" || v == "F") v.reverse.padTo(20, ' ').reverse
        else {
          val quoted = "'" + v.replace("'", "''").padTo(8, ' ') + "'"
          quoted.padTo(20, ' ')
        }
      (k.padTo(8, ' ') + "= " + value).padTo(80, ' ')
    }.mkString + "END".padTo(80, ' ')
    cards + " " * ((2880 - cards.length % 2880) % 2880)
  }

  /** Handshake + chunked send of one frame over UDS. */
  def sendUds(socketPath: String, payload: Array[Byte],
      chunkSize: Int = 65536): Unit = {
    val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
    ch.connect(UnixDomainSocketAddress.of(socketPath))
    try send(ch, payload, chunkSize) finally ch.close()
  }

  /** Handshake + chunked send of one frame over TCP. */
  def sendTcp(host: String, port: Int, payload: Array[Byte],
      chunkSize: Int = 65536): Unit = {
    val ch = SocketChannel.open(new InetSocketAddress(host, port))
    try send(ch, payload, chunkSize) finally ch.close()
  }

  /** Read the server's 7-byte `proceed` go-ahead. `readFully` loops over
    * partial reads, so a TCP-fragmented reply can't spuriously fail the
    * check the way a single read() would. */
  private def awaitProceed(in: DataInputStream): Unit = {
    val reply = new Array[Byte]("proceed".length)
    try in.readFully(reply)
    catch { case _: java.io.EOFException =>
      throw new IllegalStateException("handshake rejected: connection closed")
    }
    val r = new String(reply, StandardCharsets.UTF_8)
    require(r == "proceed", s"handshake rejected: '$r'")
  }

  /** Accumulate reply bytes until they parse as one complete JSON value
    * (the server keeps the connection open for further requests, so EOF
    * cannot delimit the reply; fragmentation-safe unlike a single read). */
  private def readJsonReply(in: DataInputStream, maxBytes: Int = 1 << 20): String = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](4096)
    while (buf.size() < maxBytes) {
      val n = in.read(chunk)
      require(n > 0 || buf.size() > 0, "no reply")
      if (n > 0) buf.write(chunk, 0, n)
      val s = buf.toString("UTF-8")
      try {
        if (mapper.readTree(s) != null) return s
      } catch {
        case _: com.fasterxml.jackson.core.JacksonException => // incomplete
      }
      if (n <= 0) return s // EOF with unparseable buffer: surface as-is
    }
    buf.toString("UTF-8")
  }

  private def send(ch: SocketChannel, payload: Array[Byte],
      chunkSize: Int): Unit = {
    val out = new DataOutputStream(Channels.newOutputStream(ch))
    val in = new DataInputStream(Channels.newInputStream(ch))
    out.write(s"""["epic_image", ${payload.length}]"""
      .getBytes(StandardCharsets.UTF_8))
    out.flush()
    awaitProceed(in)
    var off = 0
    while (off < payload.length) {
      val len = math.min(chunkSize, payload.length - off)
      out.write(payload, off, len)
      off += len
    }
    out.flush()
  }

  /** Remote watch management over the same socket the images flow through
    * (the reference dispatches both by processor name, uds_server.py:
    * 122-137). `json` is an object of addWatch parameters; returns the
    * server's JSON reply (`{"id":N}` or `{"error":…}`). */
  def sendWatchUds(socketPath: String, json: String): String = {
    val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
    ch.connect(UnixDomainSocketAddress.of(socketPath))
    try sendWatch(ch, json) finally ch.close()
  }

  def sendWatchTcp(host: String, port: Int, json: String): String = {
    val ch = SocketChannel.open(new InetSocketAddress(host, port))
    try sendWatch(ch, json) finally ch.close()
  }

  private def sendWatch(ch: SocketChannel, json: String): String = {
    val out = new DataOutputStream(Channels.newOutputStream(ch))
    val in = new DataInputStream(Channels.newInputStream(ch))
    val payload = json.getBytes(StandardCharsets.UTF_8)
    out.write(s"""["watch_source", ${payload.length}]"""
      .getBytes(StandardCharsets.UTF_8))
    out.flush()
    awaitProceed(in)
    out.write(payload)
    out.flush()
    readJsonReply(in)
  }

  /** C2 remote form: fetch the active watchlist over the same socket
    * (reference client shape: test_esp_client.py:6-10). Returns the
    * server's JSON array of watchlist rows. */
  def fetchWatchlistUds(socketPath: String): String = {
    val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
    ch.connect(UnixDomainSocketAddress.of(socketPath))
    try fetchWatchlist(ch) finally ch.close()
  }

  def fetchWatchlistTcp(host: String, port: Int): String = {
    val ch = SocketChannel.open(new InetSocketAddress(host, port))
    try fetchWatchlist(ch) finally ch.close()
  }

  private def fetchWatchlist(ch: SocketChannel): String = {
    val out = new DataOutputStream(Channels.newOutputStream(ch))
    val in = new DataInputStream(Channels.newInputStream(ch))
    out.write("""["fetch_watchlist", 0]""".getBytes(StandardCharsets.UTF_8))
    out.flush()
    awaitProceed(in)
    readJsonReply(in)
  }
}
