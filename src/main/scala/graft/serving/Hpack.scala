package graft.serving

import java.nio.charset.StandardCharsets.ISO_8859_1
import scala.collection.mutable

/**
 * HPACK (RFC 7541) header compression for the h2c façade listener.
 *
 * The reference terminates HTTP/2 cleartext on its consumer API via
 * golang.org/x/net's h2c wrapper (`internal/consuming/server.go:116,163`);
 * this is the corresponding header-codec half for [[H2cServer]]. Scope is a
 * server endpoint:
 *
 *  - [[Decoder]] handles every request-side representation: indexed fields
 *    (static + dynamic table), literals with/without/never indexing, dynamic
 *    table size updates, and Huffman-coded strings (the Appendix B canonical
 *    code — clients Huffman-encode whenever it is shorter, so a decoder
 *    without it cannot interoperate). The dynamic table must be maintained
 *    even though we never *reference* it ourselves: indices the client sends
 *    later are defined relative to insertions made by earlier literals.
 *  - [[Encoder]] is deliberately stateless: responses use
 *    literal-without-indexing with raw (non-Huffman) strings, which is
 *    always legal, keeps no encoder/decoder sync obligations, and costs a
 *    few bytes on a control-plane surface.
 *
 * Tables are the published RFC 7541 Appendix A (static table) and Appendix B
 * (Huffman code) constants.
 */
object Hpack {

  /** RFC 7541 Appendix A — the 61-entry static table, 1-indexed. */
  val Static: IndexedSeq[(String, String)] = IndexedSeq(
    ":authority" -> "", ":method" -> "GET", ":method" -> "POST",
    ":path" -> "/", ":path" -> "/index.html", ":scheme" -> "http",
    ":scheme" -> "https", ":status" -> "200", ":status" -> "204",
    ":status" -> "206", ":status" -> "304", ":status" -> "400",
    ":status" -> "404", ":status" -> "500", "accept-charset" -> "",
    "accept-encoding" -> "gzip, deflate", "accept-language" -> "",
    "accept-ranges" -> "", "accept" -> "", "access-control-allow-origin" -> "",
    "age" -> "", "allow" -> "", "authorization" -> "", "cache-control" -> "",
    "content-disposition" -> "", "content-encoding" -> "",
    "content-language" -> "", "content-length" -> "",
    "content-location" -> "", "content-range" -> "", "content-type" -> "",
    "cookie" -> "", "date" -> "", "etag" -> "", "expect" -> "",
    "expires" -> "", "from" -> "", "host" -> "", "if-match" -> "",
    "if-modified-since" -> "", "if-none-match" -> "", "if-range" -> "",
    "if-unmodified-since" -> "", "last-modified" -> "", "link" -> "",
    "location" -> "", "max-forwards" -> "", "proxy-authenticate" -> "",
    "proxy-authorization" -> "", "range" -> "", "referer" -> "",
    "refresh" -> "", "retry-after" -> "", "server" -> "", "set-cookie" -> "",
    "strict-transport-security" -> "", "transfer-encoding" -> "",
    "user-agent" -> "", "vary" -> "", "via" -> "", "www-authenticate" -> "")

  /** RFC 7541 Appendix B — Huffman code for symbols 0..255 + EOS(256). */
  private val HuffCodes: Array[Long] = Array(
    0x1ff8L, 0x7fffd8L, 0xfffffe2L, 0xfffffe3L, 0xfffffe4L, 0xfffffe5L, 0xfffffe6L, 0xfffffe7L,
    0xfffffe8L, 0xffffeaL, 0x3ffffffcL, 0xfffffe9L, 0xfffffeaL, 0x3ffffffdL, 0xfffffebL, 0xfffffecL,
    0xfffffedL, 0xfffffeeL, 0xfffffefL, 0xffffff0L, 0xffffff1L, 0xffffff2L, 0x3ffffffeL, 0xffffff3L,
    0xffffff4L, 0xffffff5L, 0xffffff6L, 0xffffff7L, 0xffffff8L, 0xffffff9L, 0xffffffaL, 0xffffffbL,
    0x14L, 0x3f8L, 0x3f9L, 0xffaL, 0x1ff9L, 0x15L, 0xf8L, 0x7faL,
    0x3faL, 0x3fbL, 0xf9L, 0x7fbL, 0xfaL, 0x16L, 0x17L, 0x18L,
    0x0L, 0x1L, 0x2L, 0x19L, 0x1aL, 0x1bL, 0x1cL, 0x1dL,
    0x1eL, 0x1fL, 0x5cL, 0xfbL, 0x7ffcL, 0x20L, 0xffbL, 0x3fcL,
    0x1ffaL, 0x21L, 0x5dL, 0x5eL, 0x5fL, 0x60L, 0x61L, 0x62L,
    0x63L, 0x64L, 0x65L, 0x66L, 0x67L, 0x68L, 0x69L, 0x6aL,
    0x6bL, 0x6cL, 0x6dL, 0x6eL, 0x6fL, 0x70L, 0x71L, 0x72L,
    0xfcL, 0x73L, 0xfdL, 0x1ffbL, 0x7fff0L, 0x1ffcL, 0x3ffcL, 0x22L,
    0x7ffdL, 0x3L, 0x23L, 0x4L, 0x24L, 0x5L, 0x25L, 0x26L,
    0x27L, 0x6L, 0x74L, 0x75L, 0x28L, 0x29L, 0x2aL, 0x7L,
    0x2bL, 0x76L, 0x2cL, 0x8L, 0x9L, 0x2dL, 0x77L, 0x78L,
    0x79L, 0x7aL, 0x7bL, 0x7ffeL, 0x7fcL, 0x3ffdL, 0x1ffdL, 0xffffffcL,
    0xfffe6L, 0x3fffd2L, 0xfffe7L, 0xfffe8L, 0x3fffd3L, 0x3fffd4L, 0x3fffd5L, 0x7fffd9L,
    0x3fffd6L, 0x7fffdaL, 0x7fffdbL, 0x7fffdcL, 0x7fffddL, 0x7fffdeL, 0xffffebL, 0x7fffdfL,
    0xffffecL, 0xffffedL, 0x3fffd7L, 0x7fffe0L, 0xffffeeL, 0x7fffe1L, 0x7fffe2L, 0x7fffe3L,
    0x7fffe4L, 0x1fffdcL, 0x3fffd8L, 0x7fffe5L, 0x3fffd9L, 0x7fffe6L, 0x7fffe7L, 0xffffefL,
    0x3fffdaL, 0x1fffddL, 0xfffe9L, 0x3fffdbL, 0x3fffdcL, 0x7fffe8L, 0x7fffe9L, 0x1fffdeL,
    0x7fffeaL, 0x3fffddL, 0x3fffdeL, 0xfffff0L, 0x1fffdfL, 0x3fffdfL, 0x7fffebL, 0x7fffecL,
    0x1fffe0L, 0x1fffe1L, 0x3fffe0L, 0x1fffe2L, 0x7fffedL, 0x3fffe1L, 0x7fffeeL, 0x7fffefL,
    0xfffeaL, 0x3fffe2L, 0x3fffe3L, 0x3fffe4L, 0x7ffff0L, 0x3fffe5L, 0x3fffe6L, 0x7ffff1L,
    0x3ffffe0L, 0x3ffffe1L, 0xfffebL, 0x7fff1L, 0x3fffe7L, 0x7ffff2L, 0x3fffe8L, 0x1ffffecL,
    0x3ffffe2L, 0x3ffffe3L, 0x3ffffe4L, 0x7ffffdeL, 0x7ffffdfL, 0x3ffffe5L, 0xfffff1L, 0x1ffffedL,
    0x7fff2L, 0x1fffe3L, 0x3ffffe6L, 0x7ffffe0L, 0x7ffffe1L, 0x3ffffe7L, 0x7ffffe2L, 0xfffff2L,
    0x1fffe4L, 0x1fffe5L, 0x3ffffe8L, 0x3ffffe9L, 0xffffffdL, 0x7ffffe3L, 0x7ffffe4L, 0x7ffffe5L,
    0xfffecL, 0xfffff3L, 0xfffedL, 0x1fffe6L, 0x3fffe9L, 0x1fffe7L, 0x1fffe8L, 0x7ffff3L,
    0x3fffeaL, 0x3fffebL, 0x1ffffeeL, 0x1ffffefL, 0xfffff4L, 0xfffff5L, 0x3ffffeaL, 0x7ffff4L,
    0x3ffffebL, 0x7ffffe6L, 0x3ffffecL, 0x3ffffedL, 0x7ffffe7L, 0x7ffffe8L, 0x7ffffe9L, 0x7ffffeaL,
    0x7ffffebL, 0xffffffeL, 0x7ffffecL, 0x7ffffedL, 0x7ffffeeL, 0x7ffffefL, 0x7fffff0L, 0x3ffffeeL,
    0x3fffffffL)

  private val HuffLens: Array[Int] = Array(
    13, 23, 28, 28, 28, 28, 28, 28, 28, 24, 30, 28, 28, 30, 28, 28,
    28, 28, 28, 28, 28, 28, 30, 28, 28, 28, 28, 28, 28, 28, 28, 28,
    6, 10, 10, 12, 13, 6, 8, 11, 10, 10, 8, 11, 8, 6, 6, 6,
    5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 7, 8, 15, 6, 12, 10,
    13, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 8, 7, 8, 13, 19, 13, 14, 6,
    15, 5, 6, 5, 6, 5, 6, 6, 6, 5, 7, 7, 6, 6, 6, 5,
    6, 7, 6, 5, 5, 6, 7, 7, 7, 7, 7, 15, 11, 14, 13, 28,
    20, 22, 20, 20, 22, 22, 22, 23, 22, 23, 23, 23, 23, 23, 24, 23,
    24, 24, 22, 23, 24, 23, 23, 23, 23, 21, 22, 23, 22, 23, 23, 24,
    22, 21, 20, 22, 22, 23, 23, 21, 23, 22, 22, 24, 21, 22, 23, 23,
    21, 21, 22, 21, 23, 22, 23, 23, 20, 22, 22, 22, 23, 22, 22, 23,
    26, 26, 20, 19, 22, 23, 22, 25, 26, 26, 26, 27, 27, 26, 24, 25,
    19, 21, 26, 27, 27, 26, 27, 24, 21, 21, 26, 26, 28, 27, 27, 27,
    20, 24, 20, 21, 22, 21, 21, 23, 22, 22, 25, 25, 24, 24, 26, 23,
    26, 27, 26, 26, 27, 27, 27, 27, 27, 28, 27, 27, 27, 27, 27, 26,
    30)

  /** (code, bitLength) → symbol; header strings are tiny, so a map probe
    * per bit-length beats building a real decode tree. */
  private val huffDecode: Map[(Long, Int), Int] =
    (0 to 256).map(i => (HuffCodes(i), HuffLens(i)) -> i).toMap

  def huffmanEncode(s: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var acc = 0L; var nbits = 0
    s.foreach { b =>
      val sym = b & 0xff
      acc = (acc << HuffLens(sym)) | HuffCodes(sym); nbits += HuffLens(sym)
      while (nbits >= 8) { out.write(((acc >>> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
    }
    if (nbits > 0) // pad with EOS prefix (all-ones)
      out.write((((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xff).toInt)
    out.toByteArray
  }

  def huffmanDecode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 2)
    var code = 0L; var len = 0
    in.foreach { b =>
      var bit = 7
      while (bit >= 0) {
        code = (code << 1) | ((b >> bit) & 1); len += 1
        huffDecode.get((code, len)) match {
          case Some(256) => throw new IllegalArgumentException("HPACK: EOS in string")
          case Some(sym) => out.write(sym); code = 0L; len = 0
          case None if len > 30 => throw new IllegalArgumentException("HPACK: bad Huffman code")
          case None =>
        }
        bit -= 1
      }
    }
    // trailing partial code must be an all-ones EOS prefix ≤7 bits
    if (len > 7 || code != (1L << len) - 1)
      throw new IllegalArgumentException("HPACK: bad Huffman padding")
    out.toByteArray
  }

  /** RFC 7541 §5.1 prefix-coded integer, appended to `out`. */
  def writeInt(out: java.io.ByteArrayOutputStream, firstByteBits: Int, prefix: Int, v0: Long): Unit = {
    val max = (1 << prefix) - 1
    if (v0 < max) out.write(firstByteBits | v0.toInt)
    else {
      out.write(firstByteBits | max)
      var v = v0 - max
      while (v >= 128) { out.write(((v % 128) + 128).toInt); v /= 128 }
      out.write(v.toInt)
    }
  }

  final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < buf.length
    def peek: Int = buf(pos) & 0xff
    def byte(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def int(prefix: Int): Long = {
      val max = (1 << prefix) - 1
      var v: Long = byte() & max
      if (v == max) {
        var shift = 0
        var b = 0
        do {
          b = byte()
          v += (b & 0x7fL) << shift; shift += 7
          if (shift > 56) throw new IllegalArgumentException("HPACK: integer overflow")
        } while ((b & 0x80) != 0)
      }
      v
    }
    def string(): String = {
      val huff = (peek & 0x80) != 0
      val len = int(7).toInt
      if (len < 0 || pos + len > buf.length)
        throw new IllegalArgumentException("HPACK: string overruns block")
      val raw = java.util.Arrays.copyOfRange(buf, pos, pos + len); pos += len
      new String(if (huff) huffmanDecode(raw) else raw, ISO_8859_1)
    }
  }

  /** Connection-scoped request-header decoder (one per h2c connection; header
    * blocks MUST be fed in connection order — the dynamic table threads
    * through them). */
  final class Decoder(var maxTableSize: Int = 4096) {
    private val dynamic = mutable.ArrayDeque.empty[(String, String)] // newest first
    private var tableSize = 0

    private def entrySize(e: (String, String)) = e._1.length + e._2.length + 32

    private def evict(): Unit =
      while (tableSize > maxTableSize && dynamic.nonEmpty) {
        tableSize -= entrySize(dynamic.removeLast())
      }

    private def insert(name: String, value: String): Unit = {
      val e = (name, value)
      tableSize += entrySize(e)
      dynamic.prepend(e)
      evict()
    }

    private def lookup(idx: Long): (String, String) = {
      if (idx >= 1 && idx <= Static.length) Static(idx.toInt - 1)
      else if (idx > Static.length && idx <= Static.length + dynamic.length)
        dynamic((idx - Static.length - 1).toInt)
      else throw new IllegalArgumentException(s"HPACK: index $idx out of range")
    }

    def decode(block: Array[Byte]): Seq[(String, String)] = {
      val r = new Reader(block)
      val out = mutable.ArrayBuffer.empty[(String, String)]
      while (r.hasNext) {
        val b = r.peek
        if ((b & 0x80) != 0) { // indexed field
          out += lookup(r.int(7))
        } else if ((b & 0xc0) == 0x40) { // literal, incremental indexing
          val idx = r.int(6)
          val name = if (idx == 0) r.string() else lookup(idx)._1
          val value = r.string()
          insert(name, value)
          out += (name -> value)
        } else if ((b & 0xe0) == 0x20) { // dynamic table size update
          val sz = r.int(5)
          if (sz > 65536) throw new IllegalArgumentException("HPACK: table size too large")
          maxTableSize = sz.toInt
          evict()
        } else { // literal without indexing (0x00) / never indexed (0x10)
          val idx = r.int(4)
          val name = if (idx == 0) r.string() else lookup(idx)._1
          out += (name -> r.string())
        }
      }
      out.toSeq
    }
  }

  /** Stateless response-side encoder: literal-without-indexing, raw strings. */
  object Encoder {
    def encode(headers: Seq[(String, String)]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(256)
      headers.foreach { case (name, value) =>
        out.write(0x00) // literal without indexing, new name
        val n = name.toLowerCase.getBytes(ISO_8859_1)
        writeInt(out, 0x00, 7, n.length); out.write(n)
        val v = value.getBytes(ISO_8859_1)
        writeInt(out, 0x00, 7, v.length); out.write(v)
      }
      out.toByteArray
    }
  }
}
