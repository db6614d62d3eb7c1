package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/**
 * Real media codecs on executor JVMs using ONLY JDK built-ins — zero
 * native or managed dependencies: `javax.imageio` (PNG/JPEG/BMP/GIF)
 * and `javax.sound.sampled` (WAV PCM). This replaces the byte-fold
 * "decode stub" of earlier rounds for payloads that actually ARE media;
 * opaque payloads still fall back to the deterministic byte-fold in
 * [[Multimodal]], so every path stays verifiable.
 *
 * All derived values are integer-exact and platform-deterministic for
 * lossless codecs: the 8×8 luma grid is a box average with integer
 * division (per-pixel luma `(299r+587g+114b)/1000`, which maps a gray
 * pixel to exactly its gray value), and the perceptual hash uses the
 * same `cell*64 > total` rule as [[graft.functions.MediaHash.ahash64]] —
 * so a PNG round-trip is replayable bit-for-bit by the SQL oracle.
 */
object MediaCodec {

  // ImageIO's stream factory defaults to FILE-backed caching: every
  // decode of an in-memory payload creates, writes and deletes a temp
  // file (FileCacheImageInputStream). Harmless on a single thread;
  // once codec passes fan out across all cores the temp-file churn
  // contends in the kernel — measured ~10× task-CPU inflation on the
  // scene-cut gate. The payloads are byte arrays already in RAM, so
  // memory-cached streams are strictly better at any scale. Built
  // PER CALL below (MemoryCacheImageInput/OutputStream) rather than via
  // the JVM-global `ImageIO.setUseCache(false)` toggle, which silently
  // changed behavior for every other ImageIO consumer in the JVM and
  // only took effect if this object happened to class-load first.

  /** 8×8 box-averaged luma grid (row-major, values 0..255) + true dims. */
  final case class DecodedImage(width: Int, height: Int, luma: Array[Int])

  /** 64-cell mean-|amplitude| envelope (values 0..255) + stream shape. */
  final case class DecodedAudio(
      sampleRate: Int, channels: Int, frames: Long, cells: Array[Int])

  /** Container sniffing from magic bytes — never trust a format column. */
  def sniff(b: Array[Byte]): String = {
    def at(i: Int): Int = b(i) & 0xff
    if (b.length >= 8 && at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (b.length >= 3 && at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (b.length >= 2 && at(0) == 'B' && at(1) == 'M') "bmp"
    else if (b.length >= 6 && at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (b.length >= 12 && at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else "raw"
  }

  /** Decode an image payload and reduce it to the 8×8 luma grid. The box
    * average is pure integer arithmetic over exact cell boundaries
    * (`cx*w/8 .. (cx+1)*w/8`), so the result is identical on every JVM
    * for lossless inputs. Returns None when no JDK reader claims the
    * bytes (caller falls back to the byte-fold path). */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    try {
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes)))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val luma = new Array[Int](64)
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            val x0 = cx * w / 8
            val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
            val y0 = cy * h / 8
            val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
            var sum = 0L
            var n = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val bl = rgb & 0xff
                sum += (299 * r + 587 * g + 114 * bl) / 1000
                n += 1
                x += 1
              }
              y += 1
            }
            luma(cy * 8 + cx) = (sum / n).toInt
            cx += 1
          }
          cy += 1
        }
        Some(DecodedImage(w, h, luma))
      }
    } catch { case _: Throwable => None }

  /** Decode WAV PCM (8- or 16-bit, any channel count) and reduce to a
    * 64-cell mean-|amplitude| envelope scaled to 0..255. Frames are
    * bucketed by `frame*64/totalFrames`, integer-exact. */
  def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val channels = fmt.getChannels
      val frameSize = fmt.getFrameSize
      if (bits != 8 && bits != 16) return None
      val data = ais.readAllBytes()
      ais.close()
      val frames = (data.length / frameSize).toLong
      if (frames == 0) return None
      val sumAbs = new Array[Long](64)
      val cnt = new Array[Long](64)
      val bigEndian = fmt.isBigEndian
      val unsigned8 =
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      var f = 0L
      while (f < frames) {
        val cell = ((f * 64) / frames).toInt
        val base = (f * frameSize).toInt
        var c = 0
        while (c < channels) {
          val amp =
            if (bits == 8) {
              val v = data(base + c) & 0xff
              // center: unsigned 8-bit PCM midpoint is 128, signed is 0
              math.abs((if (unsigned8) v - 128 else data(base + c).toInt)) << 8
            } else {
              val i0 = base + c * 2
              val s =
                if (bigEndian) ((data(i0) << 8) | (data(i0 + 1) & 0xff)).toShort
                else ((data(i0 + 1) << 8) | (data(i0) & 0xff)).toShort
              math.abs(s.toInt)
            }
          sumAbs(cell) += amp
          cnt(cell) += 1
          c += 1
        }
        f += 1
      }
      val cells = new Array[Int](64)
      var j = 0
      while (j < 64) {
        cells(j) = if (cnt(j) == 0) 0 else ((sumAbs(j) / cnt(j)) >> 7).toInt
        j += 1
      }
      Some(DecodedAudio(fmt.getSampleRate.toInt, channels, frames, cells))
    } catch { case _: Throwable => None }

  /** Decode mono 16-bit PCM WAV to its raw sample array — the producer
    * side of resample round trips (decimate/transform, then re-encode
    * through [[encodeWav16]]). Returns (sampleRate, samples). */
  def decodeWavSamples16(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) { ais.close(); return None }
      val data = ais.readAllBytes()
      ais.close()
      val n = data.length / 2
      val out = new Array[Short](n)
      val bigEndian = fmt.isBigEndian
      var i = 0
      while (i < n) {
        out(i) =
          if (bigEndian) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort
          else ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
        i += 1
      }
      Some((fmt.getSampleRate.toInt, out))
    } catch { case _: Throwable => None }

  /** Average-hash over 64 integer cells: bit j set iff `cell(j)*64 >
    * total` — the exact rule of [[graft.functions.MediaHash.ahash64]],
    * applied to a REAL luma/energy grid instead of raw bytes. */
  def cellHash64(cells: Array[Int]): Long = {
    require(cells.length == 64, s"cellHash64 needs 64 cells, got ${cells.length}")
    var total = 0L
    var j = 0
    while (j < 64) { total += cells(j); j += 1 }
    var h = 0L
    j = 0
    while (j < 64) {
      if (cells(j) * 64L > total) h |= (1L << j)
      j += 1
    }
    h
  }

  /** Encode an 8-bit gray cell grid as a real PNG via the JDK encoder —
    * the producer side of the codec round-trip (gates/specs build genuine
    * compressed payloads with it; PNG is lossless, so decode recovers the
    * cells exactly). */
  def encodeGrayPng(cells: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(cells.length == width * height, "cell count must match dims")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = cells(y * width + x) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    out.toByteArray
  }

  /** Encode mono 16-bit little-endian PCM WAV — producer side for audio
    * round-trips. */
  def encodeWav16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
