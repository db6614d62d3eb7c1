package graft.serving

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, IOException}
import java.net.{InetSocketAddress, ServerSocket, Socket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.{ISO_8859_1, US_ASCII}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/**
 * HTTP/2 cleartext (h2c, prior knowledge) listener for the serving façade —
 * the reference's consumer API terminates h2c the same way
 * (`internal/consuming/server.go:116,163`, golang.org/x/net `h2c.NewHandler`;
 * its gossip client speaks prior-knowledge h2c too,
 * `internal/interbroker/gossip_client.go`). Like the Go wrapper, this is a
 * TRANSPORT ADAPTER in front of the existing router: frames terminate here,
 * each completed stream is dispatched to the same HTTP/1.1 endpoint map
 * (loopback hop to the façade port — never a data path, the response bytes
 * are the same chunk the poll planner materialized), and the response is
 * re-framed as HEADERS+DATA.
 *
 * Scope (RFC 7540): connection preface check, SETTINGS exchange/ack,
 * HEADERS+CONTINUATION assembly with padding/priority stripping, DATA with
 * padding and receive-window replenishment, PING ack, WINDOW_UPDATE (both
 * directions), RST_STREAM, GOAWAY, HPACK request decoding with a live
 * dynamic table ([[Hpack.Decoder]]), response DATA split at the peer's
 * SETTINGS_MAX_FRAME_SIZE and paced by both stream and connection send
 * windows. Streams are served in arrival order on the connection's reader
 * thread (the façade's handlers are sub-millisecond registry/produce calls;
 * h2 multiplexing still lets clients pipeline requests without head-of-line
 * TCP connections).
 */
class H2cServer(targetPort: => Int, port: Int = 0) {
  import H2cServer._

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", port))
  private val pool = java.util.concurrent.Executors.newCachedThreadPool()
  @volatile private var running = true
  private val client = HttpClient.newBuilder()
    .version(HttpClient.Version.HTTP_1_1).build()

  def boundPort: Int = server.getLocalPort

  def start(): this.type = {
    pool.submit(new Runnable {
      def run(): Unit =
        while (running) {
          try {
            val sock = server.accept()
            pool.submit(new Runnable { def run(): Unit = handleConn(sock) })
          } catch { case _: IOException => /* closed */ }
        }
    })
    this
  }

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: IOException => }
    pool.shutdownNow()
  }

  // ------------------------------------------------------------- connection

  private final class StreamState {
    var headers: Seq[(String, String)] = Nil
    val body = new java.io.ByteArrayOutputStream()
    var headersDone = false
    var ended = false
  }

  private def handleConn(sock: Socket): Unit = {
    try {
      sock.setSoTimeout(30000)
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new BufferedOutputStream(sock.getOutputStream)

      val preface = new Array[Byte](Preface.length)
      in.readFully(preface)
      if (!java.util.Arrays.equals(preface, Preface)) { sock.close(); return }

      writeFrame(out, FrameSettings, 0, 0, Array.emptyByteArray); out.flush()

      val decoder = new Hpack.Decoder()
      val streams = mutable.Map.empty[Int, StreamState]
      var connSendWindow = 65535L
      val streamSendWindow = mutable.Map.empty[Int, Long]
      var peerInitialWindow = 65535L
      var peerMaxFrame = 16384
      // continuation state: header fragments must be contiguous
      var contStream = 0
      var contEndStream = false
      val contBuf = new java.io.ByteArrayOutputStream()
      var goaway = false

      def dispatchIfComplete(sid: Int): Unit = {
        val st = streams(sid)
        if (st.headersDone && st.ended) {
          streams.remove(sid)
          val resp = dispatch(st.headers, st.body.toByteArray)
          // response HEADERS
          val hdrs = (":status" -> resp.status.toString) +:
            resp.headers.filterNot { case (n, _) => DropResponse(n.toLowerCase) }
          writeFrame(out, FrameHeaders, FlagEndHeaders |
            (if (resp.body.isEmpty) FlagEndStream else 0), sid,
            Hpack.Encoder.encode(hdrs))
          // response DATA, paced by send windows, split at peer max frame
          var off = 0
          while (off < resp.body.length) {
            val want = math.min(peerMaxFrame, resp.body.length - off)
            val allowed = math.min(want.toLong, math.min(connSendWindow,
              streamSendWindow.getOrElse(sid, peerInitialWindow)))
            if (allowed <= 0) {
              out.flush()
              // block on the reader until the peer opens the window
              if (!pumpOneFrame()) throw new EOFException("peer closed mid-body")
            } else {
              val n = allowed.toInt
              val last = off + n >= resp.body.length
              writeFrame(out, FrameData, if (last) FlagEndStream else 0, sid,
                java.util.Arrays.copyOfRange(resp.body, off, off + n))
              connSendWindow -= n
              streamSendWindow.update(sid,
                streamSendWindow.getOrElse(sid, peerInitialWindow) - n)
              off += n
            }
          }
          out.flush()
        }
      }

      /** Read and process exactly one frame; false on GOAWAY/EOF. */
      def pumpOneFrame(): Boolean = {
        val len = (in.read() << 16) | (in.readUnsignedByte() << 8) | in.readUnsignedByte()
        if (len < 0) return false
        val tpe = in.readUnsignedByte()
        val flags = in.readUnsignedByte()
        val sid = in.readInt() & 0x7fffffff
        if (len > (1 << 24)) throw new IOException("frame too large")
        val payload = new Array[Byte](len)
        in.readFully(payload)

        if (contStream != 0 && tpe != FrameContinuation)
          throw new IOException("expected CONTINUATION")

        tpe match {
          case FrameSettings =>
            if ((flags & FlagAck) == 0) {
              var i = 0
              while (i + 6 <= payload.length) {
                val id = ((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff)
                val v = ((payload(i + 2) & 0xff).toLong << 24) |
                  ((payload(i + 3) & 0xff) << 16) |
                  ((payload(i + 4) & 0xff) << 8) | (payload(i + 5) & 0xff)
                id match {
                  // id 1 (HEADER_TABLE_SIZE) constrains the peer's DECODER —
                  // i.e. our response encoder, which is stateless and never
                  // references the dynamic table, so it needs no action; our
                  // request decoder follows the client's in-block size updates
                  case 4 => // INITIAL_WINDOW_SIZE re-bases open stream windows
                    val delta = v - peerInitialWindow
                    peerInitialWindow = v
                    streamSendWindow.keys.foreach(k =>
                      streamSendWindow.update(k, streamSendWindow(k) + delta))
                  case 5 => peerMaxFrame = math.min(v, 1L << 20).toInt
                  case _ =>
                }
                i += 6
              }
              writeFrame(out, FrameSettings, FlagAck, 0, Array.emptyByteArray); out.flush()
            }

          case FrameHeaders =>
            var body = payload
            var padLen = 0
            // malformed-frame lengths throw IOException (connection error
            // per RFC 7540 §4.2/§6.2) — an unchecked body(0) on an empty
            // padded frame would throw AIOOBE instead, escaping the
            // handler's catch and leaking the socket
            if ((flags & FlagPadded) != 0) {
              if (body.isEmpty) throw new IOException("malformed PADDED HEADERS")
              padLen = body(0) & 0xff; body = body.drop(1)
            }
            if ((flags & FlagPriority) != 0) {
              if (body.length < 5) throw new IOException("malformed priority block")
              body = body.drop(5)
            }
            if (padLen > body.length)
              throw new IOException("padding exceeds payload")
            if (padLen > 0) body = body.dropRight(padLen)
            val st = streams.getOrElseUpdate(sid, new StreamState)
            if ((flags & FlagEndStream) != 0) st.ended = true
            if ((flags & FlagEndHeaders) != 0) {
              val decoded = decoder.decode(body)
              // a SECOND header block on a stream is the request TRAILERS:
              // it must be decoded (the connection's HPACK dynamic table
              // advances either way) but must never REPLACE the request
              // headers — :method/:path live there, and a trailer
              // overwrite would dispatch the request as GET /
              if (!st.headersDone) {
                st.headers = decoded
                st.headersDone = true
              }
              dispatchIfComplete(sid)
            } else {
              contStream = sid; contEndStream = st.ended
              contBuf.reset(); contBuf.write(body)
            }

          case FrameContinuation =>
            if (sid != contStream) throw new IOException("CONTINUATION stream mismatch")
            contBuf.write(payload)
            if ((flags & FlagEndHeaders) != 0) {
              val st = streams.getOrElseUpdate(sid, new StreamState)
              val decoded = decoder.decode(contBuf.toByteArray)
              if (!st.headersDone) {
                st.headers = decoded
                st.headersDone = true
              }
              if (contEndStream) st.ended = true
              contStream = 0
              dispatchIfComplete(sid)
            }

          case FrameData =>
            var body = payload
            if ((flags & FlagPadded) != 0) {
              if (body.isEmpty) throw new IOException("malformed PADDED DATA")
              val padLen = body(0) & 0xff
              if (padLen > body.length - 1)
                throw new IOException("padding exceeds payload")
              body = body.drop(1).dropRight(padLen)
            }
            streams.get(sid).foreach { st =>
              st.body.write(body)
              if (st.body.size > (8 << 20)) throw new IOException("request body too large")
            }
            // replenish receive windows as consumed (uploads larger than the
            // 64 KiB default window — e.g. 1 MiB produce bodies — stall
            // without this)
            if (payload.length > 0) {
              writeWindowUpdate(out, 0, payload.length)
              if ((flags & FlagEndStream) == 0) writeWindowUpdate(out, sid, payload.length)
              out.flush()
            }
            if ((flags & FlagEndStream) != 0) streams.get(sid).foreach { st =>
              st.ended = true; dispatchIfComplete(sid)
            }

          case FramePing =>
            if ((flags & FlagAck) == 0) { writeFrame(out, FramePing, FlagAck, 0, payload); out.flush() }

          case FrameWindowUpdate =>
            if (payload.length < 4)
              throw new IOException("malformed WINDOW_UPDATE")
            val inc = ((payload(0) & 0x7f).toLong << 24) | ((payload(1) & 0xff) << 16) |
              ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
            if (sid == 0) connSendWindow += inc
            else streamSendWindow.update(sid,
              streamSendWindow.getOrElse(sid, peerInitialWindow) + inc)

          case FrameRstStream => streams.remove(sid)
          case FrameGoaway => goaway = true
          case _ => // PRIORITY, PUSH_PROMISE, unknown: ignore
        }
        !goaway
      }

      var alive = true
      while (alive) {
        alive = try pumpOneFrame() catch { case _: EOFException => false }
      }
      try {
        writeFrame(out, FrameGoaway, 0, 0, new Array[Byte](8)); out.flush()
      } catch { case _: IOException => }
      sock.close()
    } catch {
      // NonFatal, not just IO/IllegalArgument: any escape here would leak
      // the socket (and its pool thread's connection slot) — a malformed
      // frame must never cost a file descriptor
      case scala.util.control.NonFatal(_) =>
        try sock.close() catch { case _: IOException => }
    }
  }

  /** Loopback hop to the HTTP/1.1 router — same handlers, one source of
    * truth for the API surface (exactly what the Go h2c wrapper does with
    * its inner `http.Handler`). */
  private def dispatch(headers: Seq[(String, String)], body: Array[Byte]): Resp = {
    val h = headers.toMap
    val method = h.getOrElse(":method", "GET")
    val path = h.getOrElse(":path", "/")
    try {
      val builder = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$targetPort$path"))
        .method(method,
          if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
          else HttpRequest.BodyPublishers.ofByteArray(body))
      headers.foreach { case (n, v) =>
        if (!n.startsWith(":") && !DropRequest(n.toLowerCase)) builder.header(n, v)
      }
      val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofByteArray())
      val outHeaders = resp.headers().map().asScala.toSeq.flatMap { case (n, vs) =>
        vs.asScala.map(v => n.toLowerCase -> v)
      }.filterNot { case (n, _) => n == ":status" }.sortBy(_._1)
      Resp(resp.statusCode(), outHeaders, resp.body())
    } catch {
      case e: Exception =>
        Resp(502, Seq("content-type" -> "text/plain"),
          s"h2c dispatch failed: ${e.getMessage}".getBytes(US_ASCII))
    }
  }

  private def writeWindowUpdate(out: java.io.OutputStream, sid: Int, inc: Int): Unit = {
    val p = new Array[Byte](4)
    p(0) = ((inc >>> 24) & 0x7f).toByte; p(1) = ((inc >>> 16) & 0xff).toByte
    p(2) = ((inc >>> 8) & 0xff).toByte; p(3) = (inc & 0xff).toByte
    writeFrame(out, FrameWindowUpdate, 0, sid, p)
  }
}

object H2cServer {
  final case class Resp(status: Int, headers: Seq[(String, String)], body: Array[Byte])

  val Preface: Array[Byte] = "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(ISO_8859_1)

  val FrameData = 0x0
  val FrameHeaders = 0x1
  val FramePriority = 0x2
  val FrameRstStream = 0x3
  val FrameSettings = 0x4
  val FramePushPromise = 0x5
  val FramePing = 0x6
  val FrameGoaway = 0x7
  val FrameWindowUpdate = 0x8
  val FrameContinuation = 0x9

  val FlagEndStream = 0x1
  val FlagAck = 0x1
  val FlagEndHeaders = 0x4
  val FlagPadded = 0x8
  val FlagPriority = 0x20

  /** Connection-specific headers that must not cross the adapter. */
  val DropRequest: Set[String] = Set(
    "connection", "keep-alive", "proxy-connection", "transfer-encoding",
    "upgrade", "te", "host", "content-length", "http2-settings")
  val DropResponse: Set[String] = Set(
    "connection", "keep-alive", "proxy-connection", "transfer-encoding",
    "upgrade", "content-length", "date")

  def writeFrame(out: java.io.OutputStream, tpe: Int, flags: Int, sid: Int,
      payload: Array[Byte]): Unit = {
    val len = payload.length
    out.write((len >>> 16) & 0xff); out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    out.write(tpe); out.write(flags)
    out.write((sid >>> 24) & 0x7f); out.write((sid >>> 16) & 0xff)
    out.write((sid >>> 8) & 0xff); out.write(sid & 0xff)
    out.write(payload)
  }
}
