package graft.sources

import graft.log.{LogMetadata, TopicConfig}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Iceberg-style METADATA TABLES: `SELECT * FROM polar.<topic>.files |
 * history | partitions | groups` — the registry surfaced as queryable
 * relations, so
 * an operator inspects layout/commit state in pure SQL instead of the
 * library API (the SQL face of the reference's admin/status endpoints,
 * `/root/reference/internal/consuming/server.go`).
 *
 * Rows are computed DRIVER-SIDE from the metadata registry at scan build
 * time (fresh per query, O(files) / O(versions) / O(partitions) — never
 * data-sized) and delivered through a [[LocalScan]]: no executors, no file
 * I/O, exactly the planning arithmetic every real scan already does.
 */
private[sources] object PolarMetaTables {

  val Names: Set[String] =
    Set("files", "history", "partitions", "groups", "pending_deletes")

  def apply(cfg: TopicConfig, kind: String): Table = apply(cfg, kind, None)

  /** `versionAsOf` renders the view from that RETAINED snapshot — the
    * layout/partition state the topic had at the commit (`SELECT * FROM
    * polar.t.files VERSION AS OF 3`); `history` and `groups` are
    * version-independent ledgers and refuse rather than mislead. */
  def apply(cfg: TopicConfig, kind: String, versionAsOf: Option[Long]): Table = {
    require(versionAsOf.isEmpty || kind == "files" || kind == "partitions" ||
        kind == "pending_deletes",
      s"VERSION AS OF applies to the files/partitions/pending_deletes " +
        s"views, not '$kind' " +
        "(history IS the version ledger; groups are live state)")
    def snap(): LogMetadata = versionAsOf match {
      case Some(v) => LogMetadata.readAt(cfg, v)
      case None => LogMetadata.read(cfg)
    }
    render(cfg, kind, snap)
  }

  private def render(
      cfg: TopicConfig, kind: String, snap: () => LogMetadata): Table = kind match {
    case "files" => table(cfg, "files", FilesSchema, snap) { meta =>
      meta.files.map { f =>
        new GenericInternalRow(Array[Any](
          f.part, UTF8String.fromString(f.name), f.minOffset, f.maxOffset,
          f.count, f.bytes, f.createdMs,
          if (f.tsMin == Long.MinValue) null else f.tsMin,
          if (f.tsMax == Long.MaxValue) null else f.tsMax,
          if (f.tsNulls < 0) null else f.tsNulls,
          f.txn.map(UTF8String.fromString).orNull,
          if (f.txn.isEmpty || f.txnEpoch < 0) null else f.txnEpoch))
      }
    }
    case "history" => table(cfg, "history", HistorySchema, snap) { _ =>
      LogMetadata.history(cfg).map(m => new GenericInternalRow(Array[Any](
        m.version, m.commitMs, m.files.size, m.producerOffsets.sum)))
    }
    case "partitions" => table(cfg, "partitions", PartitionsSchema, snap) { meta =>
      (0 until meta.numPartitions).map { p =>
        val fs = meta.filesOf(p)
        new GenericInternalRow(Array[Any](
          p, fs.size, fs.map(_.count).sum, fs.map(_.bytes).sum,
          meta.producerOffsets(p)))
      }
    }
    // the file.delete.delay.ms ledger: segments already UNREGISTERED whose
    // physical delete is deferred — what a `vacuum` past each `due_ms`
    // will reclaim (the operational answer to "why is disk usage above
    // the registry's byte count")
    case "pending_deletes" =>
      table(cfg, "pending_deletes", PendingDeletesSchema, snap) { meta =>
        meta.pendingDeletes.map(pd => new GenericInternalRow(Array[Any](
          pd.part, UTF8String.fromString(pd.name), pd.dueMs)))
      }
    // the `--list` + `--describe` view of Kafka's group tooling in one
    // relation: every registered group × partition with committed/tail/lag
    case "groups" => table(cfg, "groups", GroupsSchema, snap) { _ =>
      graft.log.ConsumerGroups.listGroups(cfg).flatMap { g =>
        graft.log.ConsumerGroups.groupLag(cfg, g).map(l =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(g), l.part, l.committed, l.tail, l.lag)))
      }
    }
  }

  val FilesSchema: StructType = StructType(Seq(
    StructField("part", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("min_offset", LongType, nullable = false),
    StructField("max_offset", LongType, nullable = false),
    StructField("records", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("created_ms", LongType, nullable = false),
    // null = unknown (legacy pre-stats manifest entries / all-null files)
    StructField("ts_min", LongType, nullable = true),
    StructField("ts_max", LongType, nullable = true),
    StructField("ts_nulls", LongType, nullable = true),
    // producer-transaction mark (null = plain committed segment): the SQL
    // face of "which segments does an unresolved transaction still hold";
    // txn_epoch is the producing incarnation's fencing epoch (null for
    // r13 manifests, whose marks predate epoch stamping)
    StructField("txn", StringType, nullable = true),
    StructField("txn_epoch", LongType, nullable = true)))

  val HistorySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("commit_ms", LongType, nullable = false),
    StructField("files", IntegerType, nullable = false),
    StructField("records", LongType, nullable = false)))

  val GroupsSchema: StructType = StructType(Seq(
    StructField("group_id", StringType, nullable = false),
    StructField("part", IntegerType, nullable = false),
    StructField("committed", LongType, nullable = false),
    StructField("tail", LongType, nullable = false),
    StructField("lag", LongType, nullable = false)))

  val PendingDeletesSchema: StructType = StructType(Seq(
    StructField("part", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("due_ms", LongType, nullable = false)))

  val PartitionsSchema: StructType = StructType(Seq(
    StructField("part", IntegerType, nullable = false),
    StructField("files", IntegerType, nullable = false),
    StructField("records", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("tail_offset", LongType, nullable = false)))

  private def table(cfg: TopicConfig, kind: String, outSchema: StructType,
      snap: () => LogMetadata)(
      render: LogMetadata => Seq[InternalRow]): Table =
    new Table with SupportsRead {
      override def name(): String = s"polar:${cfg.topic}.$kind"
      override def schema(): StructType = outSchema
      override def capabilities(): java.util.Set[TableCapability] =
        java.util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = {
            // head registry read at BUILD time: every query sees a fresh,
            // single-snapshot view (one doc read + cached manifests).
            // NB: named so the LocalScan's own `rows()` cannot shadow it
            // (a `rows` val here becomes an infinite self-call)
            val rendered = render(snap()).toArray
            new LocalScan {
              override def rows(): Array[InternalRow] = rendered
              override def readSchema(): StructType = outSchema
              override def description(): String = s"polar:${cfg.topic}.$kind"
            }
          }
        }
    }
}
