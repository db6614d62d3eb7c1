package graft.sources

import graft.log.{FileEntry, LogMetadata, RingTemplate, TopicConfig}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => VSortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/**
 * Per-row `topic` routing for the sink (SURVEY §2 A1/A8) — the Kafka
 * writer contract: when no `topic` option is set and the frame carries a
 * `topic` column, each row is produced to ITS topic, in one pass over the
 * data. The reference's produce path is per-record-topic the same way
 * (`/root/reference/internal/producing/server.go:126-132` — the topic is
 * an URL parameter per request, and one producer fans out across topics).
 *
 * Shape (the routed twin of [[PolarWrite]]):
 *
 *  1. CLUSTERED by `(topic, part)` + locally SORTED by `(topic, part,
 *     __o*)` — every (topic, partition) pair lands wholly in one task, so
 *     the single-writer-per-partition offset assignment holds per topic
 *     exactly as it does for a single-topic produce.
 *  2. Each task opens one [[PolarDataWriter]] per topic it encounters,
 *     reading that topic's offset bases from its root doc ON FIRST
 *     ENCOUNTER (executor-side, one GET per topic per task — the topic
 *     set is data-dependent, so there is nothing for the driver to read
 *     up front). Offsets baked from a stale base are absorbed by the
 *     commit-time rebase, the same mechanism that already covers
 *     streaming epochs and concurrent producers.
 *  3. The driver groups commit messages BY TOPIC and commits each topic
 *     through its own [[PolarBatchWrite]] CAS — per-topic atomicity, the
 *     multi-topic produce being a sequence of independent topic commits
 *     (the reference has no cross-topic transaction either). An abort
 *     after a partial commit reclaims only the UNCOMMITTED topics' files;
 *     committed topics stay (their CAS landed — they are the log now).
 *
 * Streaming epochs commit with the (queryId, epochId) txn per topic, so a
 * replayed epoch is idempotent PER TOPIC: topics that committed before a
 * crash drop the replay, topics that did not register it now.
 *
 * At 100 TB: one exchange routes rows to (topic, partition) owners — the
 * same shuffle a single-topic produce pays — and metadata I/O is
 * O(topics), not O(rows) or O(tasks × partitions).
 */
class PolarRoutedWrite(
    template: RingTemplate,
    schema: StructType,
    maxFileBytes: Long,
    // server-level record-size cap, the fallback where a destination has
    // no max.message.bytes prop — enforced at the append (the routed
    // envelope cannot bake a per-destination cap: topics are data-dependent)
    defaultMaxMessageSize: Int = graft.log.PolarLog.DefaultMaxMessageSize,
    queryId: String = "",
    txnRetentionMs: Long = PolarWrite.DefaultTxnRetentionMs)
    extends Write with RequiresDistributionAndOrdering {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(
      Expressions.identity("topic"), Expressions.identity("part")))

  override def requiredOrdering(): Array[VSortOrder] = {
    val orderCols = schema.fieldNames.filter(_.startsWith("__o"))
      .sortBy(_.stripPrefix("__o").toInt)
    ("topic" +: "part" +: orderCols.toSeq)
      .map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
      .toArray
  }

  override def toBatch: BatchWrite =
    new PolarRoutedBatchWrite(template, schema, maxFileBytes,
      defaultMaxMessageSize, None, txnRetentionMs)

  override def toStreaming: StreamingWrite =
    new PolarRoutedStreamingWrite(template, schema, maxFileBytes,
      defaultMaxMessageSize, if (queryId == null) "" else queryId,
      txnRetentionMs)

  override def supportedCustomMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new PolarSegmentsWrittenMetric, new PolarRecordsWrittenMetric)
}

/** Commit message of a routed task: that task's sealed segments, grouped
  * by the topic they belong to. */
final case class PolarRoutedCommitMessage(topicFiles: Map[String, Seq[FileEntry]])
  extends WriterCommitMessage

class PolarRoutedBatchWrite(
    template: RingTemplate,
    schema: StructType,
    maxFileBytes: Long,
    defaultMaxMessageSize: Int,
    txn: Option[(String, Long)],
    txnRetentionMs: Long) extends BatchWrite {

  // topics whose CAS landed — an abort after a partial multi-topic commit
  // must not reclaim THEIR files (they are registered log segments now)
  private val committedTopics = scala.collection.mutable.Set.empty[String]
  // the intent journal written for a multi-topic commit (crash recovery
  // anchor); an in-process FAILURE path deletes it in abort — Spark's
  // abort already resolves that case to the documented partial state
  private var journal: Option[String] = None

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PolarRoutedWriterFactory(template, schema, maxFileBytes,
      defaultMaxMessageSize)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val byTopic: Map[String, Array[FileEntry]] = messages.flatMap {
      case PolarRoutedCommitMessage(m) => m.toSeq
      case other => throw new IllegalStateException(s"unexpected commit message $other")
    }.groupBy(_._1).map { case (t, vs) => t -> vs.flatMap(_._2) }
    // a MULTI-topic fan-out writes the intent journal first: a kill
    // between the per-topic CASes below leaves the journal for the sweep's
    // recovery pass to drive to all-or-none ([[TxnJournal]]); a
    // single-topic commit is one CAS and needs none of this.
    // Batch commits (no streaming txn) stamp a SYNTHETIC (sinkId, 0) txn:
    // each topic's CAS records it in the root doc, so recovery classifies
    // "already committed" from the doc itself — robust against compaction
    // or cleaning renaming the staged entries before recovery runs — and
    // a recovery roll-forward of a topic that actually committed is a
    // no-op through the normal replay check instead of a duplicate.
    val effTxn =
      if (byTopic.size > 1) txn.orElse(Some(
        s"polar-routed-${java.util.UUID.randomUUID().toString.take(12)}" -> 0L))
      else txn
    if (byTopic.size > 1)
      journal = Some(graft.log.TxnJournal.write(template.root,
        byTopic.map { case (t, fs) => t -> fs.toSeq }, effTxn))
    // deterministic commit order; each topic is one independent CAS with
    // the full rebase/retry/idempotence machinery of a single-topic
    // produce. The heartbeat before each CAS keeps recovery's grace
    // window measured from last PROGRESS, so a long multi-topic commit is
    // not rolled back underneath itself.
    byTopic.toSeq.sortBy(_._1).foreach { case (t, files) =>
      journal.foreach(graft.log.TxnJournal.heartbeat)
      new PolarBatchWrite(template.topicConfig(t), schema, maxFileBytes,
        effTxn, txnRetentionMs).commit(Array(PolarCommitMessage(files.toSeq)))
      committedTopics += t
    }
    journal.foreach(graft.log.TxnJournal.delete)
    journal = None
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case PolarRoutedCommitMessage(m) =>
        m.foreach { case (t, files) =>
          if (!committedTopics.contains(t))
            graft.log.PolarLog.quietDelete(files.map(f =>
              s"${template.topicConfig(t).dir}/part=${f.part}/${f.name}"))
        }
      case _ => ()
    }
    // in-process failure: the uncommitted staged files are gone (above), so
    // the journal has nothing left to drive — the partial state is the
    // documented failure semantics, and recovery must not chew on it
    journal.foreach(graft.log.TxnJournal.delete)
    journal = None
  }
}

object PolarRoutedWrite {

  /** Drive orphaned multi-topic commit journals to a terminal state — the
    * recovery half of [[graft.log.TxnJournal]], run by the retention
    * sweep before vacuum (so staged files outlive their journal).
    *
    * Per journal older than `graceMs` (in-flight commits are protected):
    *  - INCOMPLETE intent (no commit point): the commit died before any
    *    CAS could have run — reclaim the staged files, drop the journal
    *    ("none").
    *  - complete: classify each topic — COMMITTED (every journal entry
    *    registered, or the journal's (sinkId, batchId) txn already
    *    recorded: a streaming replay re-landed it under rebased names),
    *    FORWARDABLE (nothing registered, every staged file still on
    *    disk), or LOST (files gone, never committed). No LOST → roll the
    *    forwardable topics through the normal commit path (rebase, CAS
    *    retries, idempotence) and drop the journal ("all"). Any LOST →
    *    mark the journal `.failed` for the operator — roll-forward is
    *    impossible and unregistering already-visible topics would yank
    *    records readers may have consumed.
    *
    * Returns the number of journals resolved. */
  def recoverJournals(
      template: RingTemplate,
      graceMs: Long,
      nowMs: Long = System.currentTimeMillis()): Int = {
    val conf = graft.log.HadoopConf.shared
    def rm(path: String): Unit = graft.log.PolarLog.quietDelete(Seq(path))
    var resolved = 0
    graft.log.TxnJournal.list(template.root)
      .filter(_.ageAnchorMs <= nowMs - graceMs)
      .foreach { j =>
        try {
          if (!j.complete) {
            j.topics.foreach { case (t, files) =>
              val cfg = template.topicConfig(t)
              files.foreach(f => rm(f.path(cfg)))
            }
            graft.log.TxnJournal.delete(j.path)
            resolved += 1
          } else {
            sealed trait St
            case object Committed extends St
            case object Forwardable extends St
            case object Lost extends St
            val states: Map[String, St] = j.topics.map { case (t, files) =>
              val cfg = template.topicConfig(t)
              val meta = LogMetadata.read(cfg)
              val byTxn = j.txn.exists { case (sid, b) =>
                meta.sinkCommits.get(sid).exists(_ >= b) }
              // a commit that lost a CAS race REBASES: the registered name
              // is `rb<suffix>-<originalName>` and the original file is
              // deleted — still committed, match either spelling
              def holds(f: FileEntry): Boolean =
                meta.filesOf(f.part).exists(e => e.name == f.name ||
                  (e.name.startsWith("rb") && e.name.endsWith(s"-${f.name}")))
              val registered = files.forall(holds)
              lazy val onDisk = files.forall { f =>
                val p = new Path(f.path(cfg))
                try p.getFileSystem(conf).exists(p)
                catch { case _: java.io.IOException => false }
              }
              t -> (if (registered || byTxn) (Committed: St)
                    else if (onDisk) Forwardable else Lost)
            }
            if (!states.valuesIterator.contains(Committed)) {
              // the kill landed before ANY topic's CAS: the job failed from
              // its caller's perspective and a batch re-run carries no
              // idempotence key — roll BACK ("none"), never materialize a
              // batch its owner believes dead
              j.topics.foreach { case (t, files) =>
                val cfg = template.topicConfig(t)
                files.foreach(f => rm(f.path(cfg)))
              }
              graft.log.TxnJournal.delete(j.path)
              resolved += 1
            } else if (states.valuesIterator.contains(Lost)) {
              graft.log.TxnJournal.markFailed(j.path)
            } else {
              states.foreach {
                case (t, Forwardable) =>
                  val cfg = template.topicConfig(t)
                  new PolarBatchWrite(cfg, graft.log.PolarLog.ValueSchema,
                    PolarWrite.DefaultMaxFileBytes, j.txn)
                    .commit(Array(PolarCommitMessage(j.topics(t))))
                case (t, Committed) =>
                  // a replay re-landed this topic under rebased names: the
                  // journal-named duplicates are unregistered orphans
                  val cfg = template.topicConfig(t)
                  val meta = LogMetadata.read(cfg)
                  j.topics(t).filterNot(f =>
                    meta.filesOf(f.part).exists(_.name == f.name))
                    .foreach(f => rm(f.path(cfg)))
                case _ => ()
              }
              graft.log.TxnJournal.delete(j.path)
              resolved += 1
            }
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            // leave the journal for the next sweep's retry, but say so: a
            // DETERMINISTIC thrower would otherwise be re-chewed forever
            // with zero operator-visible signal
            System.err.println(
              s"[polar] journal recovery failed for ${j.path}: ${e.getMessage}")
        }
      }
    resolved
  }
}

/** Streaming twin: each epoch commits per topic with the (queryId,
  * epochId) txn, so replays are dropped per topic at each CAS authority —
  * exactly-once visibility per topic across failure/replay. */
class PolarRoutedStreamingWrite(
    template: RingTemplate,
    schema: StructType,
    maxFileBytes: Long,
    defaultMaxMessageSize: Int,
    queryId: String,
    txnRetentionMs: Long) extends StreamingWrite {

  // ONE delegate per epoch, shared by commit and abort: after a partially
  // failed multi-topic commit (topic a's CAS landed, topic b threw) the
  // abort MUST see the same committedTopics the commit populated — a
  // fresh delegate would delete topic a's now-REGISTERED segments
  private val delegates =
    scala.collection.concurrent.TrieMap.empty[Long, PolarRoutedBatchWrite]
  private def delegate(epochId: Long): PolarRoutedBatchWrite =
    delegates.getOrElseUpdate(epochId, new PolarRoutedBatchWrite(
      template, schema, maxFileBytes, defaultMaxMessageSize,
      Some((queryId, epochId)), txnRetentionMs))

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new PolarRoutedWriterFactory(template, schema, maxFileBytes,
      defaultMaxMessageSize)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // a throw skips the removal, so the delegate (with its committedTopics)
    // is still there when Spark calls abort for this epoch
    delegate(epochId).commit(messages)
    delegates.remove(epochId): Unit
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    delegate(epochId).abort(messages)
    delegates.remove(epochId): Unit
  }
}

class PolarRoutedWriterFactory(
    template: RingTemplate,
    schema: StructType,
    maxFileBytes: Long,
    defaultMaxMessageSize: Int)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PolarRoutedDataWriter(template, schema, taskId, maxFileBytes,
      defaultMaxMessageSize)
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new PolarRoutedDataWriter(template, schema, taskId, maxFileBytes,
      defaultMaxMessageSize)
}

/** One [[PolarDataWriter]] per topic this task encounters; bases read from
  * each topic's root doc on first encounter (a new topic reads as empty —
  * bases all 0 — and is created by the commit). */
class PolarRoutedDataWriter(
    template: RingTemplate,
    schema: StructType,
    taskId: Long,
    maxFileBytes: Long,
    defaultMaxMessageSize: Int = graft.log.PolarLog.DefaultMaxMessageSize)
    extends DataWriter[InternalRow] {

  private val topicIdx = schema.fieldIndex("topic")
  private val valueIdx = schema.fieldIndex("value")
  private val tsIdx = schema.fieldIndex("timestamp")
  // LogAppendTime destinations stamp every record with THIS task's append
  // wall-clock — one stamp per writer, like the broker stamping a batch
  private val appendMicros = System.currentTimeMillis() * 1000L
  // one entry per destination: (writer, record-size cap, appendTime). The
  // cap is the topic's max.message.bytes prop when set, else the
  // server-level default — resolved from the same root-doc read that
  // supplies the offset bases. The routed path cannot bake a
  // per-destination cap into the envelope like a single-topic produce
  // (destinations are data-dependent), so this is the broker-side append
  // check, per Kafka — and a topic cap WIDER than the server default is
  // honored here too, matching the single-topic authority rule.
  // message.timestamp.type resolves the same way: per destination, at the
  // append — and so do the KIP-937 CreateTime timestamp bounds (checked
  // against THIS task's append clock, the same stamp LogAppendTime uses).
  private case class Dest(w: PolarDataWriter, cap: Int, appendTime: Boolean,
      beforeMaxMs: Long, afterMaxMs: Long)
  private val writers =
    scala.collection.mutable.LinkedHashMap.empty[String, Dest]

  // same clamp as the envelope path: a bound at/above MaxTsBoundMs is
  // unbounded (wider than any representable timestamp) and keeps the
  // `append_clock ± bound` arithmetic inside Long
  private def msBound(ms: Long): Long =
    if (ms >= graft.log.PolarLog.MaxTsBoundMs) Long.MaxValue else ms

  override def write(row: InternalRow): Unit = {
    if (row.isNullAt(topicIdx)) throw new IllegalArgumentException(
      "row-routed produce: the 'topic' column must not be null " +
        "(set a 'topic' write option for a single-topic default)")
    val t = row.getUTF8String(topicIdx).toString
    val Dest(w, cap, appendTime, beforeMaxMs, afterMaxMs) =
      writers.getOrElseUpdate(t, {
      if (!TopicConfig.validTopicName(t)) throw new IllegalArgumentException(
        s"Invalid topic name in 'topic' column: '$t'")
      val cfg = template.topicConfig(t)
      // routed first-encounter CREATES the topic: new names obey the
      // 248-byte creation cap. Existence is the ROOT DOC's (readIfExists),
      // not version == 0: a CREATE TABLE'd never-produced topic sits at
      // version 0 with a doc on disk — a grandfathered long-named one must
      // stay writable, exactly like the HTTP produce surface (review-found)
      val metaOpt = LogMetadata.readIfExists(cfg)
      if (metaOpt.isEmpty && !TopicConfig.validNewTopicName(t))
        throw new IllegalArgumentException(
          s"Invalid new topic name in 'topic' column: '$t' (max 248 UTF-8 bytes)")
      val meta = metaOpt.getOrElse(LogMetadata.empty(cfg))
      require(meta.clusterSize == cfg.clusterSize &&
          meta.rangesPerToken == cfg.rangesPerToken,
        s"topic $t exists with different ring layout")
      // per-topic segment.bytes governs this destination's roll size;
      // compression.type its storage codec
      val (beforeMs, afterMs) = graft.log.PolarLog.timestampBounds(meta.props)
      Dest(new PolarDataWriter(cfg.dir, schema, meta.producerOffsets.toArray,
        taskId, graft.log.PolarLog.effectiveMaxFileBytes(meta.props, maxFileBytes),
        PolarWrite.effectiveCodec(meta.props)),
        meta.props.get(graft.log.TopicProps.MaxMessageBytes)
          .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
          .filter(_ > 0).getOrElse(defaultMaxMessageSize),
        graft.log.PolarLog.logAppendTime(meta.props),
        msBound(beforeMs), msBound(afterMs))
    })
    if (!row.isNullAt(valueIdx) && row.getBinary(valueIdx).length > cap)
      throw new IllegalArgumentException(
        s"record value exceeds topic '$t' max.message.bytes=$cap")
    // KIP-937: CreateTime destinations validate the event time against the
    // append clock; LogAppendTime destinations skip it (the producer's
    // timestamp is about to be discarded anyway, per Kafka)
    if (!appendTime && !row.isNullAt(tsIdx) &&
        (beforeMaxMs != Long.MaxValue || afterMaxMs != Long.MaxValue)) {
      // ms granularity, the configs' own unit (micros remainder ignored —
      // a sub-ms sliver can never decide a clock-skew window)
      val tsMs = row.getLong(tsIdx) / 1000L
      val appendMs = appendMicros / 1000L
      val tooOld = beforeMaxMs != Long.MaxValue && tsMs < appendMs - beforeMaxMs
      val tooNew = afterMaxMs != Long.MaxValue && tsMs > appendMs + afterMaxMs
      if (tooOld || tooNew) throw new IllegalArgumentException(
        s"record timestamp ${tsMs}ms out of range vs broker time for topic " +
          s"'$t' (message.timestamp.before.max.ms/after.max.ms)")
    }
    if (appendTime) row match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
        u.setNotNullAt(tsIdx); u.setLong(tsIdx, appendMicros)
      case r => r.update(tsIdx, appendMicros)
    }
    w.write(row)
  }

  override def commit(): WriterCommitMessage =
    PolarRoutedCommitMessage(writers.map { case (t, d) =>
      t -> d.w.commit().asInstanceOf[PolarCommitMessage].files
    }.toMap)

  override def abort(): Unit = writers.values.foreach(_.w.abort())

  override def close(): Unit = writers.values.foreach(_.w.close())

  override def currentMetricsValues():
      Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    val per = writers.values.map(_.w.currentMetricsValues())
    def sum(n: String) = per.iterator.flatten.filter(_.name() == n).map(_.value()).sum
    def m(n: String, v: Long) =
      new org.apache.spark.sql.connector.metric.CustomTaskMetric {
        override def name(): String = n
        override def value(): Long = v
      }
    Array(m("polarSegmentsWritten", sum("polarSegmentsWritten")),
      m("polarRecordsWritten", sum("polarRecordsWritten")))
  }
}
