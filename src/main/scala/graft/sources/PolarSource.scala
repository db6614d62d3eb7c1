package graft.sources

import graft.log.{LogMetadata, PolarLog, TopicConfig}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/**
 * `spark.readStream.format("polar")` / `spark.read.format("polar")` — the
 * DSv2 source over the polar log, the consume side of the reference
 * re-expressed as a Structured Streaming `MicroBatchStream` (SURVEY.md §2
 * A12/A15–A23):
 *
 *  - consumer group ≈ the streaming query's checkpoint (commit log = the
 *    reference's offset state, `internal/consuming/offset_state.go`);
 *  - `startingOffsets` earliest|latest ≈ `onNewGroup` reset policies
 *    (`internal/types/models_offset.go:94-111`);
 *  - `maxRecordsPerTrigger` ≈ the group read queue's 2 MiB
 *    `ConsumerReadThreshold` admission control
 *    (`internal/consuming/group_read_queue.go:87-170`);
 *  - micro-batch planning = one `InputPartition` per log partition per
 *    offset delta, files selected by footer offset stats (the sparse-index
 *    seek, `internal/data/index_file_reader.go:26-77`);
 *  - the reader is row-oriented over the parquet chunks — deliberately: the
 *    consume path serves records in offset order, exactly like the
 *    reference's segment reader serving chunks (`internal/data/
 *    segment_reader.go:106-195`). Analytics go through the vectorized batch
 *    path (`PolarLog.consume`) instead.
 *
 * Scale posture: planning is O(files-in-delta) driver-side metadata; each
 * micro-batch reads only row groups overlapping its offset range; partitions
 * stream independently so a 1000-executor cluster drains all log partitions
 * in parallel.
 */
class PolarTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "polar"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PolarSource.FullSchema
  // writes arrive with the PRODUCER schema (partitionKey/timestamp/value —
  // a subset of the consume schema, like Kafka's source vs sink shape);
  // accepting external metadata lets the write-side table report the
  // incoming schema so AppendData resolves
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PolarTable(PolarSource.configFrom(properties.asScala.toMap), schema)
}

object PolarSource {
  val FullSchema: StructType = PolarLog.ValueSchema
    .add(StructField("part", IntegerType, nullable = false))
    .add(StructField("topic", StringType, nullable = false))

  def configFrom(opts: Map[String, String]): PolarSourceConfig = {
    def opt(k: String) = opts.collectFirst {
      case (key, v) if key.equalsIgnoreCase(k) => v
    }
    val root = opt("root").getOrElse(
      throw new IllegalArgumentException("polar source requires option 'root'"))
    val topic = opt("topic").getOrElse(
      throw new IllegalArgumentException("polar source requires option 'topic'"))
    PolarSourceConfig(
      TopicConfig(root, topic,
        opt("clusterSize").map(_.toInt).getOrElse(3),
        opt("rangesPerToken").map(_.toInt).getOrElse(4)),
      startingOffsets = opt("startingOffsets").getOrElse("latest").toLowerCase,
      maxRecordsPerTrigger = opt("maxRecordsPerTrigger").map(_.toLong))
  }
}

final case class PolarSourceConfig(
    topic: TopicConfig,
    startingOffsets: String,
    maxRecordsPerTrigger: Option[Long])

class PolarTable(cfg: PolarSourceConfig, externalSchema: StructType = null)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"polar:${cfg.topic.topic}"
  override def schema(): StructType =
    if (externalSchema != null && externalSchema.nonEmpty) externalSchema
    else PolarSource.FullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PolarScanBuilder(cfg)

  /** `df.write.format("polar").mode("append")` — the batch produce path
    * (SURVEY §7 PR2 sink contract). A V1Write fallback is the right shape
    * here: produce needs the placement SHUFFLE + offset-assignment window
    * before files are written, which a per-task `DataWriter` cannot
    * express — the reference's single-writer-per-partition invariant
    * (`/root/reference/internal/producing/coalescer.go:24-27`) lives in
    * [[graft.log.PolarLog.produce]]'s plan instead. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
              require(!overwrite,
                "the polar log is append-only (reference semantics); use mode(\"append\")")
              PolarLog.produce(data, cfg.topic): Unit
            }
        }
    }
}

/** Scan-time pruning bounds accepted from Catalyst filters: a per-partition
  * offset window plus an optional partition set. The offset seek of the
  * reference's sparse index (`internal/data/index_file_reader.go:26-77`)
  * re-expressed as DSv2 filter pushdown → footer-stat file pruning. */
final case class PolarScanBounds(
    minOffset: Long = 0L,
    maxOffsetExclusive: Long = Long.MaxValue,
    parts: Option[Set[Int]] = None)

class PolarScanBuilder(cfg: PolarSourceConfig) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var bounds = PolarScanBounds()
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = PolarSource.FullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the canonical field order; a projection like (value, offset)
    // must still decode rows once, in schema order
    required = StructType(PolarSource.FullSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  private def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case GreaterThanOrEqual("offset", v) => asLong(v).exists { n =>
        bounds = bounds.copy(minOffset = math.max(bounds.minOffset, n)); true }
      case GreaterThan("offset", v) => asLong(v).exists { n =>
        // n+1 would wrap at Long.MaxValue; offset > MaxValue is the empty set,
        // which minOffset = MaxValue (an empty [MaxValue, end) window) encodes
        val lo = if (n == Long.MaxValue) Long.MaxValue else n + 1
        bounds = bounds.copy(minOffset = math.max(bounds.minOffset, lo)); true }
      case LessThan("offset", v) => asLong(v).exists { n =>
        bounds = bounds.copy(maxOffsetExclusive = math.min(bounds.maxOffsetExclusive, n)); true }
      case LessThanOrEqual("offset", v) => asLong(v).exists { n =>
        // <= MaxValue is a tautology: accept without narrowing (n+1 wraps)
        if (n != Long.MaxValue)
          bounds = bounds.copy(maxOffsetExclusive = math.min(bounds.maxOffsetExclusive, n + 1))
        true }
      case EqualTo("part", v) => asLong(v).exists { n =>
        val s = Set(n.toInt)
        bounds = bounds.copy(parts = Some(bounds.parts.fold(s)(_ intersect s)))
        true }
      case In("part", vs) =>
        val ns = vs.flatMap(asLong).map(_.toInt).toSet
        bounds = bounds.copy(parts = Some(bounds.parts.fold(ns)(_ intersect ns)))
        true
      case _ => false
    }
    // everything stays residual: pruning is file/partition-granular, Spark
    // re-applies the exact predicates on the rows we do return
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new PolarScan(cfg, bounds, required)
}

class PolarScan(
    cfg: PolarSourceConfig,
    bounds: PolarScanBounds = PolarScanBounds(),
    required: StructType = PolarSource.FullSchema)
    extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"PolarScan(${cfg.topic.dir}, offsets=[${bounds.minOffset}," +
      s"${bounds.maxOffsetExclusive}), parts=${bounds.parts.getOrElse("all")}, " +
      s"ReadSchema=${required.fieldNames.mkString(",")})"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val tails = PolarLog.tails(cfg.topic)
      val kept = bounds.parts match {
        case Some(ps) => tails.filter { case (p, _) => ps.contains(p) }
        case None => tails
      }
      val start = PolarOffsets(kept.map { case (p, _) => p -> bounds.minOffset })
      val end = PolarOffsets(kept.map { case (p, t) =>
        p -> math.min(t, bounds.maxOffsetExclusive) })
      PolarMicroBatchStream.plan(cfg.topic, start, end)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new PolarReaderFactory(cfg.topic.topic, required)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PolarMicroBatchStream(cfg)
}

/** Streaming offsets: next-offset-to-read per log partition, as JSON. */
final case class PolarOffsets(tails: Map[Int, Long]) extends Offset {
  override def json(): String =
    tails.toSeq.sorted.map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
  def totalFrom(start: PolarOffsets): Long =
    tails.map { case (p, o) => o - start.tails.getOrElse(p, 0L) }.sum
}

object PolarOffsets {
  def parse(json: String): PolarOffsets =
    PolarOffsets(""""(\d+)"\s*:\s*(\d+)""".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
  def zeros(cfg: TopicConfig): PolarOffsets =
    PolarOffsets((0 until cfg.numPartitions).map(_ -> 0L).toMap)
}

class PolarMicroBatchStream(cfg: PolarSourceConfig)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val topic = cfg.topic
  @volatile private var availableNowCap: Option[PolarOffsets] = None

  private def currentTails: PolarOffsets = PolarOffsets(PolarLog.tails(topic))

  override def initialOffset(): Offset = cfg.startingOffsets match {
    case "earliest" => PolarOffsets.zeros(topic)
    case "latest" => currentTails
    case other => PolarOffsets.parse(other) // explicit {"p":offset,...}
  }

  override def getDefaultReadLimit: ReadLimit =
    cfg.maxRecordsPerTrigger.map(n => ReadLimit.maxRows(n))
      .getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(currentTails)

  override def reportLatestOffset(): Offset = currentTails

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[PolarOffsets]
    val target = availableNowCap.getOrElse(currentTails)
    limit match {
      case rows: ReadMaxRows =>
        // greedy fill across partitions in index order — the group read
        // queue's round-robin-until-threshold, collapsed to one pass
        var budget = rows.maxRows()
        val capped = target.tails.toSeq.sorted.map { case (p, tail) =>
          val cur = from.tails.getOrElse(p, 0L)
          val take = math.min(tail - cur, budget)
          budget -= math.max(take, 0L)
          p -> (cur + math.max(take, 0L))
        }.toMap
        PolarOffsets(capped)
      case _ => target
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    PolarMicroBatchStream.plan(topic,
      start.asInstanceOf[PolarOffsets], end.asInstanceOf[PolarOffsets])

  override def createReaderFactory(): PartitionReaderFactory =
    new PolarReaderFactory(topic.topic)

  override def deserializeOffset(json: String): Offset = PolarOffsets.parse(json)
  override def commit(end: Offset): Unit = () // checkpoint log is the commit store
  override def stop(): Unit = ()
  override def toString: String = s"PolarScan(${topic.dir})"
}

object PolarMicroBatchStream {
  /** One InputPartition per log partition with pending offsets; files chosen
    * by footer offset stats so only the overlapping tail is read. */
  def plan(cfg: TopicConfig, start: PolarOffsets, end: PolarOffsets): Array[InputPartition] = {
    val conf = new Configuration()
    end.tails.toSeq.sorted.flatMap { case (p, endOff) =>
      val startOff = start.tails.getOrElse(p, 0L)
      if (endOff <= startOff) None
      else {
        val dir = new Path(s"${cfg.dir}/part=$p")
        val fs = dir.getFileSystem(conf)
        if (!fs.exists(dir)) None
        else {
          val files = fs.listStatus(dir).toSeq
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString)
            .filter { f =>
              val (lo, hi) = PolarReaderFactory.fileOffsetRange(f, conf)
              hi >= startOff && lo < endOff
            }
          if (files.isEmpty) None
          else Some(PolarInputPartition(p, files, startOff, endOff))
        }
      }
    }.toArray
  }
}

final case class PolarInputPartition(
    part: Int,
    files: Seq[String],
    startOffset: Long,
    endOffset: Long) extends InputPartition

class PolarReaderFactory(
    topicName: String,
    required: StructType = PolarSource.FullSchema) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PolarPartitionReader(partition.asInstanceOf[PolarInputPartition], topicName, required)
}

object PolarReaderFactory {
  // log files are immutable once visible, so footer stats are cached for the
  // life of the driver — planning stays O(files-in-delta) footer READS even
  // though every trigger inspects the full listing
  private val rangeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** (min, max) of the offset column across a file's row groups. */
  def fileOffsetRange(file: String, conf: Configuration): (Long, Long) = {
    val cached = rangeCache.get(file)
    if (cached != null) return cached
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    val range = try {
      val stats = reader.getFooter.getBlocks.asScala.flatMap { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == "offset").map(_.getStatistics)
      }
      (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
        stats.map(_.genericGetMax.asInstanceOf[Long]).max)
    } finally reader.close()
    rangeCache.put(file, range)
    range
  }
}

/** Row-oriented reader over the log's parquet chunks, offset-filtered —
  * the per-poll record serving of the reference's segment reader. Emits
  * only the pruned `required` columns (in canonical schema order). */
class PolarPartitionReader(
    p: PolarInputPartition,
    topicName: String,
    required: StructType = PolarSource.FullSchema)
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  // indices into the canonical full row for each required field
  private val keepIdx: Array[Int] =
    required.fieldNames.map(PolarSource.FullSchema.fieldIndex)
  private val fileIter = p.files.sorted.iterator
  private var reader: org.apache.parquet.hadoop.ParquetReader[
    org.apache.parquet.example.data.Group] = _
  private var current: InternalRow = _
  private val topicUtf8 = UTF8String.fromString(topicName)

  private def nextReader(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (!fileIter.hasNext) return false
    val f = fileIter.next()
    reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new GroupReadSupport(), new Path(f)).withConf(conf).build()
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !nextReader()) return false
      val g = reader.read()
      if (g == null) {
        if (!nextReader()) return false
      } else {
        val offset = g.getLong("offset", 0)
        if (offset >= p.startOffset && offset < p.endOffset) {
          current = toRow(g, offset)
          return true
        }
      }
    }
    false
  }

  private def field(g: org.apache.parquet.example.data.Group, name: String): Boolean =
    g.getType.containsField(name) &&
      g.getFieldRepetitionCount(name) > 0

  private def toRow(g: org.apache.parquet.example.data.Group, offset: Long): InternalRow = {
    val key =
      if (field(g, "partitionKey")) UTF8String.fromString(g.getString("partitionKey", 0))
      else null
    val token: Any =
      if (field(g, "token")) java.lang.Long.valueOf(g.getLong("token", 0)) else null
    val tsMicros: Any =
      if (field(g, "timestamp")) java.lang.Long.valueOf(g.getLong("timestamp", 0)) else null
    val value =
      if (field(g, "value")) g.getBinary("value", 0).getBytes else null
    val full = Array[Any](key, token, offset, tsMicros, value, p.part, topicUtf8)
    if (keepIdx.length == full.length) new GenericInternalRow(full)
    else new GenericInternalRow(keepIdx.map(full))
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) reader.close()
}
