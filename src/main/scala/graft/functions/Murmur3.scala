package graft.functions

/**
 * MurmurHash3 x64 128-bit, Cassandra variant, returning the H1 half.
 *
 * This is the partitioner hash of the reference system
 * (`/root/reference/internal/types/murmur.go:37` `Murmur3H1`), which is the
 * gocql/Cassandra flavor of Austin Appleby's public-domain MurmurHash3.
 * Spark's built-in `hash()` is Murmur3 x86_32 and `xxhash64` is xxHash, so
 * neither reproduces the reference's token placement; this 64-bit variant is
 * required for placement fidelity (SURVEY.md §1.1).
 *
 * Implemented from the public algorithm over signed 64-bit ops (Long wraps
 * identically to Go int64 / Java long). Verified against the golden vectors
 * in `/root/reference/internal/types/murmur_test.go:80-113`.
 */
object Murmur3 {
  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  @inline private def rotl(v: Long, r: Int): Long = java.lang.Long.rotateLeft(v, r)

  @inline private def fmix(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  @inline private def getLongLE(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) |
      ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) |
      ((d(i + 3) & 0xffL) << 24) |
      ((d(i + 4) & 0xffL) << 32) |
      ((d(i + 5) & 0xffL) << 40) |
      ((d(i + 6) & 0xffL) << 48) |
      ((d(i + 7) & 0xffL) << 56)

  /** H1 half of murmur3 x64 128 with seed 0 over the whole array. */
  def hash(data: Array[Byte]): Long = hash(data, 0, data.length)

  def hash(data: Array[Byte], offset: Int, length: Int): Long = {
    var h1 = 0L
    var h2 = 0L
    val nblocks = length >>> 4
    var i = 0
    while (i < nblocks) {
      val base = offset + (i << 4)
      var k1 = getLongLE(data, base)
      var k2 = getLongLE(data, base + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    // Cassandra-variant quirk: tail bytes are SIGN-extended (DataStax Java
    // `(long) key[i]`; gocql `int64(int8(p))`). Scala's Byte→Long conversion
    // sign-extends, matching exactly.
    var k1 = 0L
    var k2 = 0L
    val tail = offset + (nblocks << 4)
    val rem = length & 15
    if (rem >= 15) k2 ^= data(tail + 14).toLong << 48
    if (rem >= 14) k2 ^= data(tail + 13).toLong << 40
    if (rem >= 13) k2 ^= data(tail + 12).toLong << 32
    if (rem >= 12) k2 ^= data(tail + 11).toLong << 24
    if (rem >= 11) k2 ^= data(tail + 10).toLong << 16
    if (rem >= 10) k2 ^= data(tail + 9).toLong << 8
    if (rem >= 9) {
      k2 ^= data(tail + 8).toLong
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem >= 8) k1 ^= data(tail + 7).toLong << 56
    if (rem >= 7) k1 ^= data(tail + 6).toLong << 48
    if (rem >= 6) k1 ^= data(tail + 5).toLong << 40
    if (rem >= 5) k1 ^= data(tail + 4).toLong << 32
    if (rem >= 4) k1 ^= data(tail + 3).toLong << 24
    if (rem >= 3) k1 ^= data(tail + 2).toLong << 16
    if (rem >= 2) k1 ^= data(tail + 1).toLong << 8
    if (rem >= 1) {
      k1 ^= data(tail).toLong
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= length.toLong
    h2 ^= length.toLong
    h1 += h2
    h2 += h1
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 += h2
    h1
  }

  /** Hash of a string's UTF-8 bytes (the reference's `HashToken`,
    * `/root/reference/internal/types/token.go:44-46`). */
  def hashString(s: String): Long =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Entry point used by generated code: UTF8String without copying charset
    * conversions twice. */
  def hashUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = s.getBytes
    hash(b, 0, b.length)
  }
}
