package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}
import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

/**
 * Topic configuration: where the log lives and how the token space is carved.
 *
 * `clusterSize * rangesPerToken` is the fixed partition count of a topic —
 * the Spark rendition of the reference's brokers × consumer-ranges layout
 * (`/root/reference/internal/conf/config.go:248-250`,
 * `internal/types/token.go:49-66`). Fixed at topic creation, exactly like the
 * reference's "rangesPerToken must never change during the lifetime of a
 * topic" caveat (`token.go:55-57`).
 */
final case class TopicConfig(
    root: String,
    topic: String,
    clusterSize: Int = 3,
    rangesPerToken: Int = 4) {
  require(graft.functions.TokenMath.validRingLength(clusterSize) || clusterSize == 1,
    s"clusterSize must be 1 or 3*2^n, got $clusterSize")
  require(TopicConfig.validTopicName(topic),
    s"Invalid topic: '$topic' (empty, path-unsafe or reserved)")
  def numPartitions: Int = clusterSize * rangesPerToken
  def dir: String = s"$root/$topic"
  def metadataPath: String = s"$dir/_polar_metadata.json"
  def groupsDir: String = s"$dir/_groups"
}

object TopicConfig {
  /** Topic-name validation — the storage-layer analog of the reference's
    * 400 "Invalid topic" on the produce path
    * (`/root/reference/internal/producing/server.go:142-143`): non-empty,
    * no path separators, not a reserved (`_`/`.`-prefixed) name. */
  def validTopicName(name: String): Boolean =
    name.nonEmpty && name.length <= 255 &&
      !name.startsWith("_") && !name.startsWith(".") &&
      name.forall(c => c.isLetterOrDigit || c == '-' || c == '_' || c == '.')
}

/** One committed data file of a topic partition: the unit of the metadata
  * file registry. Offsets `[minOffset, maxOffset]` are inclusive, dense, and
  * disjoint across a partition's files — so planning a consume of
  * `[start, end)` is pure metadata arithmetic (no directory listing, no
  * parquet footer reads): the Spark rendition of the reference's segment
  * index, lifted from per-file `.index` entries into the topic's single
  * metadata document. `bytes` feeds byte-bounded admission control;
  * `createdMs` feeds retention GC. */
final case class FileEntry(
    part: Int,
    name: String,
    minOffset: Long,
    maxOffset: Long,
    count: Long,
    bytes: Long,
    createdMs: Long) {
  def path(cfg: TopicConfig): String = s"${cfg.dir}/part=$part/$name"
}

/**
 * Driver-side control plane of a topic — the Spark replacement for the
 * reference's generation consensus + producer.offset files
 * (`/root/reference/internal/data/offset_file_writer.go`,
 * `internal/ownership/process_local.go`): a single monotonically-versioned
 * JSON document updated by atomic rename. The driver is the only metadata
 * authority (no gossip/Paxos needed), and `version` gives compare-and-set
 * against concurrent producers — mirroring the single-writer-per-partition
 * invariant of the coalescer (`internal/producing/coalescer.go:24-27`).
 *
 * `producerOffsets(p)` is the next offset to be assigned in partition p
 * (= number of records ever produced there; offsets are dense from 0).
 */
final case class LogMetadata(
    version: Long,
    clusterSize: Int,
    rangesPerToken: Int,
    producerOffsets: Vector[Long],
    files: Vector[FileEntry] = Vector.empty,
    sinkCommits: Map[String, Long] = Map.empty) {
  def numPartitions: Int = clusterSize * rangesPerToken

  /** Registered files of one partition in offset order. */
  def filesOf(part: Int): Vector[FileEntry] =
    files.filter(_.part == part).sortBy(_.minOffset)
}

object LogMetadata {

  def empty(cfg: TopicConfig): LogMetadata =
    LogMetadata(0L, cfg.clusterSize, cfg.rangesPerToken,
      Vector.fill(cfg.numPartitions)(0L))

  private def hadoopConf = new Configuration()

  def read(cfg: TopicConfig): LogMetadata = {
    val path = new Path(cfg.metadataPath)
    val fc = FileContext.getFileContext(path.toUri, hadoopConf)
    if (!fc.util().exists(path)) return empty(cfg)
    val in = fc.open(path)
    try {
      val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      val sb = new StringBuilder
      var line = reader.readLine()
      while (line != null) { sb.append(line); line = reader.readLine() }
      parse(sb.toString())
    } finally in.close()
  }

  /** Atomic publish via temp file + overwriting rename (same pattern as the
    * reference's local-db transactionality, minus SQLite). */
  def write(cfg: TopicConfig, meta: LogMetadata): Unit = {
    val path = new Path(cfg.metadataPath)
    val tmp = new Path(cfg.metadataPath + ".tmp")
    val fc = FileContext.getFileContext(path.toUri, hadoopConf)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(render(meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fc.rename(tmp, path, Options.Rename.OVERWRITE)
  }

  /** CAS update: apply `f` to the current metadata iff its version is
    * `expected.version`, else fail — the anti-concurrent-producer guard. */
  def compareAndSet(cfg: TopicConfig, expected: LogMetadata)(
      f: LogMetadata => LogMetadata): LogMetadata = {
    val current = read(cfg)
    if (current.version != expected.version)
      throw new IllegalStateException(
        s"concurrent producer detected on ${cfg.topic}: metadata version " +
          s"${current.version} != expected ${expected.version}")
    val next = f(current).copy(version = current.version + 1)
    write(cfg, next)
    next
  }

  // -- tiny hand-rolled JSON (flat schema; avoids depending on jackson API
  //    stability across Spark versions) ------------------------------------

  private[log] def render(m: LogMetadata): String = {
    val files = m.files.map(f =>
      s"""[${f.part},"${f.name}",${f.minOffset},${f.maxOffset},${f.count},""" +
        s"""${f.bytes},${f.createdMs}]""").mkString(",")
    // sink ids are checkpoint paths: hex-encode so the hand-rolled JSON
    // stays escape-free
    val sinks = m.sinkCommits.toSeq.sorted.map { case (id, b) =>
      s"""["${hexEncode(id)}",$b]"""
    }.mkString(",")
    s"""{"version":${m.version},"clusterSize":${m.clusterSize},""" +
      s""""rangesPerToken":${m.rangesPerToken},""" +
      s""""producerOffsets":[${m.producerOffsets.mkString(",")}],""" +
      s""""sinkCommits":[$sinks],""" +
      s""""files":[$files]}"""
  }

  private[log] def hexEncode(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02x").mkString

  private[log] def hexDecode(h: String): String = {
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    new String(out, java.nio.charset.StandardCharsets.UTF_8)
  }

  private val FileEntryRe =
    """\[(\d+),"([^"]+)",(-?\d+),(-?\d+),(\d+),(\d+),(\d+)\]""".r

  private val SinkCommitRe = """\["([0-9a-f]*)",(\d+)\]""".r

  private[log] def parse(s: String): LogMetadata = {
    def longField(name: String): Long = {
      val m = s""""$name"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(s)
        .getOrElse(throw new IllegalArgumentException(s"missing $name in metadata: $s"))
      m.group(1).toLong
    }
    val arr = """"producerOffsets"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"missing producerOffsets: $s"))
      .group(1).trim
    val offsets =
      if (arr.isEmpty) Vector.empty[Long]
      else arr.split(",").map(_.trim.toLong).toVector
    // file entries are flat [part,"name",min,max,count,bytes,createdMs]
    // tuples — a metadata doc predating the registry simply has none
    val files = FileEntryRe.findAllMatchIn(s).map { m =>
      FileEntry(m.group(1).toInt, m.group(2), m.group(3).toLong,
        m.group(4).toLong, m.group(5).toLong, m.group(6).toLong,
        m.group(7).toLong)
    }.toVector
    val sinks = SinkCommitRe.findAllMatchIn(s).map { m =>
      hexDecode(m.group(1)) -> m.group(2).toLong
    }.toMap
    LogMetadata(longField("version"), longField("clusterSize").toInt,
      longField("rangesPerToken").toInt, offsets, files, sinks)
  }
}
