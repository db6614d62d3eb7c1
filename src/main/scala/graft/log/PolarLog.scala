package graft.log

import graft.functions.GraftFunctions.{murmur3_h1, polar_partition}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * The partitioned, offset-addressed event log — the data plane of the engine
 * (SURVEY.md §7.1).
 *
 * Layout: `{root}/{topic}/part={p}/<n>.parquet` (zstd), envelope columns
 * `(partitionKey, token, offset, timestamp, value)`; `part` is a directory
 * partition column so topic/partition predicates prune at planning time, and
 * `offset` predicates prune at row-group level via parquet min/max stats —
 * the Spark rendition of the reference's sparse `.index` files
 * (`/root/reference/internal/data/index_file_writer.go:77-90`, SURVEY §4).
 *
 * Placement fidelity: `partition = polar_partition(murmur3_h1(key))` —
 * identical to the reference's leader routing
 * (`internal/discovery/discoverer.go:343-368`); the shuffle induced by the
 * offset-assignment window IS the router (SURVEY §2 A3). Records with a null
 * key are placed by a deterministic content hash over all partitions —
 * the declarative stand-in for the reference's round-robin default
 * (`discoverer.go:370-412`): same distribution property, no per-key order
 * implied (none is promised for null keys there either).
 *
 * Offsets are dense per partition from 0. A produce assigns
 * `base(p) + rowNumberWithinPartition` via a window ordered by the caller's
 * `orderBy` (default event timestamp, content-hash tiebreak), with `base`
 * taken from [[LogMetadata]] at plan time and advanced by CAS at commit —
 * the single-writer-per-partition invariant of the reference's coalescer
 * (`internal/producing/coalescer.go:24-27,166-167`) held by hash clustering:
 * every row of a partition lands in exactly one task.
 *
 * At 100 TB: the only shuffle is the clustering exchange (unavoidable — it
 * is the routing semantics); the write is append-only parquet per partition;
 * metadata work is O(partitions) on the driver. Consumption is a vectorized
 * parquet scan with partition pruning + offset row-group pruning, so a
 * "read partition 7 from offset X" poll touches only that directory's tail
 * files.
 */
/** The canonical event envelope as a case class (SURVEY §1.1). */
final case class PolarRecord(
    topic: String,
    partitionKey: Option[String],
    token: Option[Long],
    offset: Long,
    timestamp: java.sql.Timestamp,
    value: Array[Byte],
    part: Int)

object PolarLog {

  val ValueSchema: StructType = StructType(Seq(
    StructField("partitionKey", StringType),
    StructField("token", LongType),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType),
    StructField("value", BinaryType)))

  final case class ProduceResult(
      recordsWritten: Long,
      oldTails: Map[Int, Long],
      newTails: Map[Int, Long])

  /**
   * Append records to a topic. Input needs a `value` column (binary or
   * string); `partitionKey` (string) and `timestamp` are optional.
   * At-least-once: files land before metadata commits; a crash in between
   * re-appends on retry (consumer dedup by (partition, offset) — exactly the
   * reference's redelivery contract).
   */
  def produce(
      df: DataFrame,
      cfg: TopicConfig,
      orderBy: Seq[Column] = Nil): ProduceResult = {
    val spark = df.sparkSession
    graft.GraftSession.ensureFunctions(spark)
    val meta0 = {
      val m = LogMetadata.read(cfg)
      require(m.clusterSize == cfg.clusterSize && m.rangesPerToken == cfg.rangesPerToken,
        s"topic ${cfg.topic} exists with different ring layout")
      m
    }

    val n = cfg.numPartitions
    val in0 = df
    val withKey =
      if (in0.columns.contains("partitionKey")) in0
      else in0.withColumn("partitionKey", lit(null).cast(StringType))
    val withTs =
      if (withKey.columns.contains("timestamp")) withKey
      else withKey.withColumn("timestamp", current_timestamp())
    val normalized = withTs.withColumn("value", col("value").cast(BinaryType))

    val token = murmur3_h1(col("partitionKey"))
    val contentSpread = pmod(xxhash64(col("value"), col("timestamp")), lit(n)).cast(IntegerType)
    val partExpr = when(col("partitionKey").isNull, contentSpread)
      .otherwise(polar_partition(token, cfg.clusterSize, cfg.rangesPerToken))

    val baseMap = map(meta0.producerOffsets.zipWithIndex.flatMap {
      case (b, p) => Seq(lit(p), lit(b))
    }: _*)

    val order = if (orderBy.nonEmpty) orderBy
      else Seq(col("timestamp"), xxhash64(col("value")))
    val w = Window.partitionBy(col("part")).orderBy(order: _*)

    val enveloped = normalized
      .withColumn("token", token)
      .withColumn("part", partExpr)
      .withColumn("offset",
        element_at(baseMap, col("part")) + row_number().over(w) - 1)
      .select(col("partitionKey"), col("token"), col("offset"),
        col("timestamp"), col("value"), col("part"))

    val before = listDataFiles(cfg)
    // int64-micros timestamps in the log files (not INT96) so the streaming
    // reader's plain column access works and row-group stats stay usable —
    // scoped to this write, restoring the caller's session conf after
    val tsTypeKey = "spark.sql.parquet.outputTimestampType"
    val prevTsType = spark.conf.getOption(tsTypeKey)
    spark.conf.set(tsTypeKey, "TIMESTAMP_MICROS")
    try enveloped.write
      .mode("append")
      .option("compression", "zstd")
      .partitionBy("part")
      .parquet(cfg.dir)
    finally prevTsType match {
      case Some(v) => spark.conf.set(tsTypeKey, v)
      case None => spark.conf.unset(tsTypeKey)
    }

    val after = listDataFiles(cfg)
    val newFiles = after.map { case (p, files) =>
      p -> (files -- before.getOrElse(p, Set.empty))
    }.filter(_._2.nonEmpty)

    // tail advance from footer stats only — no second pass over the data
    val newTails: Map[Int, Long] = newFiles.map { case (p, files) =>
      val maxOff = files.map(f => footerMaxOffset(new Path(s"${cfg.dir}/part=$p/$f"))).max
      p -> (maxOff + 1)
    }

    val oldTails = meta0.producerOffsets.zipWithIndex.map(_.swap).toMap
    LogMetadata.compareAndSet(cfg, meta0) { cur =>
      cur.copy(producerOffsets = cur.producerOffsets.zipWithIndex.map {
        case (old, p) => newTails.getOrElse(p, old)
      })
    }
    val written = newTails.map { case (p, t) => t - meta0.producerOffsets(p) }.sum
    ProduceResult(written, oldTails, newTails)
  }

  /** NDJSON multi-record ingestion (SURVEY §2 A4): one request row with an
    * `application/x-ndjson` string body becomes one record per non-empty
    * line, sharing the request's key/timestamp — mirroring
    * `/root/reference/internal/producing/models.go:44-87`. CRLF bodies are
    * normalized (the reference's line scanner drops the trailing CR). */
  def ingestNdjson(
      df: DataFrame,
      cfg: TopicConfig,
      bodyCol: String = "body"): ProduceResult = {
    val exploded = df
      .withColumn("__line", explode(split(col(bodyCol), "\r?\n")))
      .filter(length(trim(col("__line"))) > 0)
      .withColumn("value", col("__line").cast(BinaryType))
      .drop("__line", bodyCol)
    produce(exploded, cfg)
  }

  /** Scan a topic (batch consume). Vectorized parquet scan; `part` prunes
    * directories, offset bounds prune row groups. `startOffsets(p)` is
    * inclusive, `endOffsets(p)` exclusive. */
  def consume(
      spark: SparkSession,
      cfg: TopicConfig,
      startOffsets: Map[Int, Long] = Map.empty,
      endOffsets: Map[Int, Long] = Map.empty): DataFrame = {
    val fs = fileSystem(cfg)
    if (!fs.exists(new Path(cfg.dir))) return emptyLog(spark, cfg)
    val hasData = listDataFiles(cfg).nonEmpty
    if (!hasData) return emptyLog(spark, cfg)

    var out = spark.read
      .schema(ValueSchema.add(StructField("part", IntegerType)))
      .option("basePath", cfg.dir)
      .parquet(cfg.dir)
      .withColumn("topic", lit(cfg.topic))
    if (startOffsets.nonEmpty) {
      val m = offsetMap(startOffsets)
      out = out.filter(col("offset") >= coalesce(element_at(m, col("part")), lit(0L)))
    }
    if (endOffsets.nonEmpty) {
      val m = offsetMap(endOffsets)
      out = out.filter(col("offset") <
        coalesce(element_at(m, col("part")), lit(Long.MaxValue)))
    }
    out
  }

  /** Records of one partition in offset order — the per-poll chunk contract
    * of the reference's segment reader (SURVEY §2 A12). */
  def consumePartition(
      spark: SparkSession,
      cfg: TopicConfig,
      partition: Int,
      fromOffset: Long = 0L,
      maxRecords: Long = Long.MaxValue): DataFrame = {
    val df = consume(spark, cfg)
      .filter(col("part") === partition && col("offset") >= fromOffset)
      .orderBy(col("offset"))
    if (maxRecords >= Int.MaxValue) df
    else df.limit(math.max(maxRecords, 0L).toInt)
  }

  /** Retention GC (SURVEY §2 A25): delete data files whose modification time
    * is older than the retention window — file-granularity age-based
    * deletion, mirroring `/root/reference/internal/data/datalog_cleaner.go`.
    * Returns deleted file count. */
  def cleanRetention(cfg: TopicConfig, retentionMs: Long,
      nowMs: Long = System.currentTimeMillis()): Int = {
    val fs = fileSystem(cfg)
    val dir = new Path(cfg.dir)
    if (!fs.exists(dir)) return 0
    val cutoff = nowMs - retentionMs
    var deleted = 0
    fs.listStatus(dir).filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
      .foreach { pdir =>
        fs.listStatus(pdir.getPath).foreach { f =>
          if (f.isFile && isDataFile(f.getPath.getName) &&
              f.getModificationTime < cutoff) {
            fs.delete(f.getPath, false)
            deleted += 1
          }
        }
      }
    deleted
  }

  /** Current tail offsets (next offset per partition). */
  def tails(cfg: TopicConfig): Map[Int, Long] =
    LogMetadata.read(cfg).producerOffsets.zipWithIndex.map(_.swap).toMap

  /** Typed facade over the envelope (`Dataset[PolarRecord]`) for callers who
    * want compile-time field checks; the DataFrame API stays primary (the
    * envelope is fixed, SURVEY §1.2). */
  def consumeTyped(spark: SparkSession, cfg: TopicConfig): Dataset[PolarRecord] = {
    import spark.implicits._
    consume(spark, cfg).as[PolarRecord]
  }

  // ------------------------------------------------------------------ utils

  private def offsetMap(m: Map[Int, Long]): Column =
    map(m.toSeq.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*)

  private def emptyLog(spark: SparkSession, cfg: TopicConfig): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      ValueSchema.add(StructField("part", IntegerType)))
      .withColumn("topic", lit(cfg.topic))

  private[log] def fileSystem(cfg: TopicConfig): FileSystem =
    new Path(cfg.root).getFileSystem(new Configuration())

  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".") && name.endsWith(".parquet")

  /** part -> data file names. */
  private[log] def listDataFiles(cfg: TopicConfig): Map[Int, Set[String]] = {
    val fs = fileSystem(cfg)
    val dir = new Path(cfg.dir)
    if (!fs.exists(dir)) return Map.empty
    fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
      .map { pdir =>
        val p = pdir.getPath.getName.stripPrefix("part=").toInt
        p -> fs.listStatus(pdir.getPath).toSeq
          .filter(f => f.isFile && isDataFile(f.getPath.getName))
          .map(_.getPath.getName).toSet
      }.filter(_._2.nonEmpty).toMap
  }

  /** Max value of the `offset` column from parquet footer stats (no data
    * read) — the analog of reading the reference's `producer.offset` file. */
  private[log] def footerMaxOffset(file: Path): Long = {
    val in = HadoopInputFile.fromPath(file, new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      reader.getFooter.getBlocks.asScala.flatMap { block =>
        block.getColumns.asScala
          .find(_.getPath.toDotString == "offset")
          .map(_.getStatistics.genericGetMax.asInstanceOf[Long])
      }.max
    } finally reader.close()
  }
}
