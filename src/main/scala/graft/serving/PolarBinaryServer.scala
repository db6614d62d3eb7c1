package graft.serving

import graft.log.TopicConfig
import org.apache.spark.sql.SparkSession

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

/**
 * The reference's binary producer transport (SURVEY §2 A2,
 * `/root/reference/internal/producing/binary_server.go:21-257`,
 * `internal/producing/binary_messages.go:22-51`,
 * `docs/developer/NETWORK_FORMATS.md:36-59`): length-prefixed frames over
 * raw TCP, big-endian throughout.
 *
 * Frame header (13 bytes): `version u8 | flags u8 | streamId u16 | opcode u8
 * | bodyLength u32 | headCrc u32`, the CRC being crc32-IEEE over the first
 * 9 bytes. Opcodes: startup=1, ready=2, error=3, produce=4,
 * produceResponse=5, heartbeat=6. A connection must open with `startup` →
 * `ready`; `produce` bodies are `[timestamp-µs i64 when flags&1] |
 * keyLen u8 | key | topicLen u8 | topic | {u32 len}{bytes}…` and are acked
 * with an empty `produceResponse` carrying the request's streamId — out of
 * order as batches commit, which is what stream ids are for. Errors come
 * back as `error` frames with `code u8 | message`.
 *
 * Produce requests flow into the SAME [[ProduceCoalescer]] as the HTTP
 * façade (the reference pools coalescers across both servers), so the wire
 * format is transport, not a second data path.
 */
class PolarBinaryServer(
    spark: SparkSession,
    root: String,
    port: Int = 0,
    clusterSize: Int = 3,
    rangesPerToken: Int = 4,
    sharedCoalescer: Option[ProduceCoalescer] = None) {

  import PolarBinaryServer._

  private val coalescer = sharedCoalescer.getOrElse(
    new ProduceCoalescer(spark, root, clusterSize, rangesPerToken))
  private val ownsCoalescer = sharedCoalescer.isEmpty
  private val listener = new ServerSocket(port, 50, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  def boundPort: Int = listener.getLocalPort

  def start(): this.type = {
    val t = new Thread(() => acceptLoop(), "polar-binary-acceptor")
    t.setDaemon(true)
    t.start()
    this
  }

  def stop(): Unit = {
    running = false
    try listener.close() catch { case _: Exception => () }
    if (ownsCoalescer) coalescer.stop()
  }

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val conn = listener.accept()
        val t = new Thread(() => serve(conn), "polar-binary-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: Exception if !running => ()
        case _: java.io.IOException => ()
      }
    }

  /** Per-connection read loop, mirroring `binaryServer.serve()`
    * (`binary_server.go:77-118`): first frame must be startup; produce is
    * handled in the background (the coalescer) and acked on commit. */
  private def serve(conn: Socket): Unit = {
    conn.setTcpNoDelay(true)
    val in = new DataInputStream(conn.getInputStream)
    val out = new DataOutputStream(conn.getOutputStream)
    val writeLock = new Object
    var initialized = false
    try {
      while (true) {
        val h = readHeader(in)
        // wire-supplied length: bound it BEFORE any allocation (a crafted
        // or desynced frame could otherwise demand a 2 GiB buffer), and
        // drop the connection on violation — past a refused body there is
        // no way to resynchronize the stream
        if (h.bodyLength < 0 || h.bodyLength > MaxFrameBytes) {
          writeFrame(out, writeLock, h.streamId, ErrorOp,
            errorBody(ServerError,
              s"frame body length ${h.bodyLength} out of bounds"))
          return
        }
        // every non-produce frame's body must be consumed (or the next
        // header read parses leftover body bytes as a frame header and the
        // stream is permanently desynchronized)
        if (!initialized) {
          in.skipNBytes(h.bodyLength.toLong)
          initialized = true
          if (h.op != StartupOp) {
            writeFrame(out, writeLock, h.streamId, ErrorOp,
              errorBody(ServerError, "Invalid first message"))
            return
          }
          writeFrame(out, writeLock, h.streamId, ReadyOp, Array.emptyByteArray)
        } else h.op match {
          case ProduceOp =>
            val body = new Array[Byte](h.bodyLength)
            in.readFully(body)
            handleProduce(h, body, out, writeLock)
          case HeartbeatOp =>
            in.skipNBytes(h.bodyLength.toLong)
            writeFrame(out, writeLock, h.streamId, ReadyOp, Array.emptyByteArray)
          case _ =>
            in.skipNBytes(h.bodyLength.toLong)
            writeFrame(out, writeLock, h.streamId, ErrorOp,
              errorBody(ServerError, "Only producer operations are supported"))
        }
      }
    } catch {
      case _: EOFException => ()
      case _: java.io.IOException => ()
    } finally {
      try conn.close() catch { case _: Exception => () }
    }
  }

  private def handleProduce(
      h: Header, body: Array[Byte], out: DataOutputStream, lock: Object): Unit = {
    try {
      var pos = 0
      val tsMicros = if ((h.flags & WithTimestampFlag) != 0) {
        val ts = java.nio.ByteBuffer.wrap(body, 0, 8).getLong
        pos = 8
        Some(ts)
      } else None
      val keyLen = body(pos) & 0xFF
      val key = new String(body, pos + 1, keyLen, UTF_8)
      pos += 1 + keyLen
      val topicLen = body(pos) & 0xFF
      val topic = new String(body, pos + 1, topicLen, UTF_8)
      pos += 1 + topicLen
      val payload = java.util.Arrays.copyOfRange(body, pos, body.length)
      if (!TopicConfig.validTopicName(topic)) {
        writeFrame(out, lock, h.streamId, ErrorOp, errorBody(ServerError, "Invalid topic"))
        return
      }
      coalescer
        .append(topic, Some(key).filter(_.nonEmpty), tsMicros,
          ProduceCoalescer.BinaryContentType, payload)
        .whenComplete { (_, err) =>
          if (err == null)
            writeFrame(out, lock, h.streamId, ProduceResponseOp, Array.emptyByteArray)
          else
            writeFrame(out, lock, h.streamId, ErrorOp,
              errorBody(ServerError, String.valueOf(err.getMessage)))
        }
      ()
    } catch {
      case e: Exception =>
        writeFrame(out, lock, h.streamId, ErrorOp,
          errorBody(ServerError, String.valueOf(e.getMessage)))
    }
  }
}

object PolarBinaryServer {
  /** Transport-level frame cap: generous headroom over the 1 MiB default
    * record cap (per-topic `max.message.bytes` may raise it), small enough
    * that a crafted/desynced length can never demand a multi-GiB buffer. */
  val MaxFrameBytes: Int = 16 << 20

  val MessageVersion: Byte = 1
  val WithTimestampFlag: Int = 0x01
  // fixed opcode numbers (`binary_messages.go:22-28`)
  val StartupOp: Byte = 1
  val ReadyOp: Byte = 2
  val ErrorOp: Byte = 3
  val ProduceOp: Byte = 4
  val ProduceResponseOp: Byte = 5
  val HeartbeatOp: Byte = 6
  // error codes (`binary_messages.go:37-40`)
  val ServerError: Byte = 0

  final case class Header(
      version: Int, flags: Int, streamId: Int, op: Byte, bodyLength: Int)

  val HeaderSize = 13

  private[serving] def readHeader(in: DataInputStream): Header = {
    val version = in.readUnsignedByte()
    val flags = in.readUnsignedByte()
    val streamId = in.readUnsignedShort()
    val op = in.readByte()
    val bodyLength = in.readInt()
    in.readInt() // head crc: read, not validated (the reference's serve()
                 // also binary.Reads it without checking)
    Header(version, flags, streamId, op, bodyLength)
  }

  /** Header bytes with the crc32-IEEE of the first 9 bytes in the tail
    * slot (`binary_messages.go:107-118`). */
  private[serving] def headerBytes(
      flags: Int, streamId: Int, op: Byte, bodyLength: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(HeaderSize)
    buf.put(MessageVersion).put(flags.toByte).putShort(streamId.toShort)
      .put(op).putInt(bodyLength)
    val crc = new CRC32
    crc.update(buf.array(), 0, HeaderSize - 4)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  private def writeFrame(
      out: DataOutputStream, lock: Object, streamId: Int, op: Byte,
      body: Array[Byte]): Unit =
    lock.synchronized {
      try {
        out.write(headerBytes(0, streamId, op, body.length))
        if (body.nonEmpty) out.write(body)
        out.flush()
      } catch { case _: java.io.IOException => () }
    }

  private def errorBody(code: Byte, message: String): Array[Byte] = {
    val msg = message.getBytes(UTF_8)
    val out = new Array[Byte](1 + msg.length)
    out(0) = code
    System.arraycopy(msg, 0, out, 1, msg.length)
    out
  }
}
