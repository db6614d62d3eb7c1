package graft.serving

import graft.GraftSession
import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.CRC32

class PolarBinaryServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  import PolarBinaryServer._

  private var spark: SparkSession = _
  private var server: PolarBinaryServer = _
  private var root: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = Files.createTempDirectory("polar_bin").toString
    server = new PolarBinaryServer(spark, root).start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    if (spark != null) spark.stop()
  }

  private class Client {
    val socket = new Socket("127.0.0.1", server.boundPort)
    val in = new DataInputStream(socket.getInputStream)
    val out = new DataOutputStream(socket.getOutputStream)

    def send(op: Byte, streamId: Int, body: Array[Byte] = Array.emptyByteArray,
        flags: Int = 0): Unit = {
      out.write(PolarBinaryServer.headerBytes(flags, streamId, op, body.length))
      out.write(body)
      out.flush()
    }

    /** Read one response frame, validating the header CRC. */
    def read(): (Header, Array[Byte]) = {
      val raw = new Array[Byte](HeaderSize)
      in.readFully(raw)
      val crc = new CRC32
      crc.update(raw, 0, HeaderSize - 4)
      val expected = ByteBuffer.wrap(raw, HeaderSize - 4, 4).getInt
      assert(crc.getValue.toInt === expected, "response header crc mismatch")
      val b = ByteBuffer.wrap(raw)
      val h = Header(b.get() & 0xFF, b.get() & 0xFF, b.getShort() & 0xFFFF,
        b.get(), { b.getInt })
      val body = new Array[Byte](h.bodyLength)
      in.readFully(body)
      (h, body)
    }

    def close(): Unit = socket.close()
  }

  private def produceBody(
      tsMicros: Option[Long], key: String, topic: String,
      messages: Seq[Array[Byte]]): Array[Byte] = {
    val keyB = key.getBytes(UTF_8)
    val topicB = topic.getBytes(UTF_8)
    val size = tsMicros.map(_ => 8).getOrElse(0) + 1 + keyB.length +
      1 + topicB.length + messages.map(_.length + 4).sum
    val buf = ByteBuffer.allocate(size)
    tsMicros.foreach(buf.putLong)
    buf.put(keyB.length.toByte).put(keyB)
    buf.put(topicB.length.toByte).put(topicB)
    messages.foreach(m => buf.putInt(m.length).put(m))
    buf.array()
  }

  test("startup handshake, produce with timestamp flag, heartbeat") {
    val c = new Client
    c.send(StartupOp, 1)
    val (ready, _) = c.read()
    assert(ready.op === ReadyOp && ready.streamId === 1)

    val msgs = Seq("alpha".getBytes(UTF_8), "beta".getBytes(UTF_8))
    c.send(ProduceOp, 7,
      produceBody(Some(123456789L), "k1", "bin-topic", msgs), flags = WithTimestampFlag)
    val (resp, _) = c.read()
    assert(resp.op === ProduceResponseOp && resp.streamId === 7)

    c.send(HeartbeatOp, 9)
    val (hb, _) = c.read()
    assert(hb.op === ReadyOp && hb.streamId === 9)
    c.close()

    val rows = PolarLog.consume(spark, TopicConfig(root, "bin-topic"))
      .select(col("partitionKey"), col("value").cast("string").as("v"),
        unix_micros(col("timestamp")).as("us"))
      .collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(1)).toSet === Set("alpha", "beta"))
    assert(rows.forall(_.getString(0) == "k1"))
    assert(rows.forall(_.getLong(2) == 123456789L))
  }

  test("first frame must be startup") {
    val c = new Client
    c.send(ProduceOp, 3, produceBody(None, "k", "t", Seq("x".getBytes(UTF_8))))
    val (err, body) = c.read()
    assert(err.op === ErrorOp && err.streamId === 3)
    assert(body(0) === ServerError)
    assert(new String(body, 1, body.length - 1, UTF_8).contains("Invalid first message"))
    c.close()
  }

  test("invalid topic is rejected with an error frame") {
    val c = new Client
    c.send(StartupOp, 1); c.read()
    c.send(ProduceOp, 4, produceBody(None, "k", "_bad", Seq("x".getBytes(UTF_8))))
    val (err, body) = c.read()
    assert(err.op === ErrorOp && err.streamId === 4)
    assert(new String(body, 1, body.length - 1, UTF_8).contains("Invalid topic"))
    c.close()
  }

  test("non-produce frames with bodies are drained, not left to desync the stream") {
    val c = new Client
    // startup AND heartbeat carrying bodies: the server must consume them,
    // or the next header read parses leftover body bytes as a frame header
    c.send(StartupOp, 1, "client-options-blob".getBytes(UTF_8))
    val (ready, _) = c.read()
    assert(ready.op === ReadyOp)
    c.send(HeartbeatOp, 2, "spurious-heartbeat-body".getBytes(UTF_8))
    val (hb, _) = c.read()
    assert(hb.op === ReadyOp && hb.streamId === 2)
    // an unknown opcode with a body must also drain
    c.send(99.toByte, 3, "unknown-op-body".getBytes(UTF_8))
    val (err, _) = c.read()
    assert(err.op === ErrorOp && err.streamId === 3)
    // the stream is still in sync: a real produce round-trips
    c.send(ProduceOp, 4, produceBody(None, "k", "bin-sync", Seq("ok".getBytes(UTF_8))))
    val (resp, _) = c.read()
    assert(resp.op === ProduceResponseOp && resp.streamId === 4)
    c.close()
    assert(PolarLog.consume(spark, TopicConfig(root, "bin-sync")).count() === 1)
  }

  test("an out-of-bounds frame length is refused and the connection dropped") {
    val c = new Client
    c.send(StartupOp, 1); c.read()
    // forge a header claiming a 2 GiB body (nothing follows): the server
    // must refuse BEFORE allocating and drop the connection
    c.out.write(PolarBinaryServer.headerBytes(0, 5, ProduceOp, Int.MaxValue))
    c.out.flush()
    val (err, body) = c.read()
    assert(err.op === ErrorOp && err.streamId === 5)
    assert(new String(body, 1, body.length - 1, UTF_8).contains("out of bounds"))
    // connection closed by the server
    intercept[java.io.IOException] {
      (0 until 16).foreach { _ => c.send(HeartbeatOp, 6); c.read() }
    }
    c.close()
  }

  test("pipelined produces ack per streamId and share coalescer flushes") {
    val c = new Client
    c.send(StartupOp, 1); c.read()
    val n = 20
    (0 until n).foreach { i =>
      c.send(ProduceOp, 100 + i,
        produceBody(Some(i.toLong), s"pk$i", "bin-pipe", Seq(s"m$i".getBytes(UTF_8))),
        flags = WithTimestampFlag)
    }
    val acked = (0 until n).map { _ =>
      val (h, _) = c.read()
      assert(h.op === ProduceResponseOp)
      h.streamId
    }.toSet
    assert(acked === (100 until 100 + n).toSet)
    c.close()
    assert(PolarLog.consume(spark, TopicConfig(root, "bin-pipe")).count() === n)
  }
}
