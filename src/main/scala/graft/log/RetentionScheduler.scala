package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.util.concurrent.{Executors, ScheduledFuture, ThreadFactory, TimeUnit}
import scala.util.control.NonFatal

/**
 * Periodic retention GC (SURVEY §2 A25): the reference runs its datalog
 * cleaner on a fixed 5-minute loop with a 168-hour default window
 * (`/root/reference/internal/data/datalog_cleaner.go:16-37`,
 * `/root/reference/internal/conf/config.go:291-302`). Each sweep:
 *
 *  1. discovers the topics under `root` (directories carrying a registry
 *     doc — one bounded listing per sweep, no data I/O);
 *  2. [[PolarLog.cleanRetention]]: unregisters-then-deletes segments older
 *     than the window. The metadata CAS is the visibility boundary — a
 *     reader planning mid-sweep either sees a file still registered (and
 *     the physical delete hasn't happened yet) or never sees it at all;
 *     offsets of surviving segments are untouched, so consumer positions
 *     stay valid exactly as in the reference;
 *  3. [[PolarLog.vacuum]]: reclaims aborted-produce orphans and superseded
 *     manifest files past their grace window.
 *
 * Scale posture: a sweep is driver-side metadata work — one root listing,
 * one registry CAS per topic with aged files, one delete per aged segment.
 * Nothing scans data; period and window are deployment knobs exactly like
 * the reference's `logRetentionDuration`.
 */
final class RetentionScheduler(
    root: String,
    retentionMs: Long = RetentionScheduler.DefaultRetentionMs,
    periodMs: Long = RetentionScheduler.DefaultPeriodMs,
    clusterSize: Int = 3,
    rangesPerToken: Int = 4,
    // optional per-topic segment compactor (e.g. PolarCompaction.compact
    // with deleteOriginals = false) — injected as a function so the
    // metadata plane stays independent of the Spark execution layer
    compactor: Option[TopicConfig => Int] = None,
    // optional KEY cleaner (PolarLogCleaner.cleanKeys) for
    // cleanup.policy=compact topics — the Kafka log-cleaner loop. Runs
    // only when the topic's version advanced since its last cleaning
    // (no new commits = nothing new to supersede) AND the dirty ratio —
    // computed by the injected function from registry bytes alone —
    // reaches `minDirtyRatio` (Kafka's min.cleanable.dirty.ratio): a
    // full-region rewrite per commit would be O(region) work per produce;
    // the ratio amortizes it to O(region) per region-doubling.
    keyCleaner: Option[TopicConfig => Long] = None,
    dirtyRatioOf: Option[LogMetadata => Double] = None,
    minDirtyRatio: Double = 0.5,
    // `max.compaction.lag.ms` support: the age of the oldest DIRTY
    // clean-region segment (PolarLogCleaner.oldestDirtyMs, injected to
    // keep the metadata plane Spark-free) and the FORCED cleaner variant
    // (cleanKeys with forceRewriteDirty = true) the deadline invokes —
    // forced passes kc-stamp removal-free dirty regions, so a breached
    // topic is cleaned ONCE and the deadline disarms until new dirt lands
    oldestDirtyOf: Option[LogMetadata => Option[Long]] = None,
    // age of the NEWEST dirty clean-region segment
    // (PolarLogCleaner.newestDirtyMs): how the sweep detects that a
    // `min.compaction.lag.ms` cut TRUNCATED the pass it just ran — a
    // truncated pass must not record the cleaner version, or an idle
    // topic's within-lag dirt would never be compacted after the lag
    // elapses (Kafka cleans on an offset checkpoint, not a version gate)
    newestDirtyOf: Option[LogMetadata => Option[Long]] = None,
    forcedKeyCleaner: Option[TopicConfig => Long] = None,
    // orphaned multi-topic commit journal recovery
    // (PolarRoutedWrite.recoverJournals): runs FIRST each sweep, so a
    // journal's staged files are rolled forward/back before any vacuum
    // could reclaim them as plain orphans
    routedRecover: Option[Long => Int] = None)
    extends AutoCloseable {

  // topic -> registry version as of its last key-cleaning pass
  private val lastCleanedVersion =
    scala.collection.mutable.Map.empty[String, Long]

  @volatile private var sweepsDone: Long = 0L
  @volatile private var mergedDone: Long = 0L
  @volatile private var recoveredDone: Long = 0L
  // marked SEGMENTS materialized by reconcileMarks — its own counter:
  // one reconciled txn may cover many segments, which would make the
  // recovered-TRANSACTIONS metric meaningless if folded in
  @volatile private var reconciledDone: Long = 0L
  @volatile private var lastSweep: Map[String, RetentionScheduler.Sweep] = Map.empty
  @volatile private var lastSweepError: Option[Throwable] = None
  private var scheduled: Option[ScheduledFuture[_]] = None

  private lazy val exec = Executors.newSingleThreadScheduledExecutor(
    new ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "polar-retention")
        t.setDaemon(true)
        t
      }
    })

  /** Begin the periodic loop (idempotent). */
  def start(): this.type = synchronized {
    if (scheduled.isEmpty)
      scheduled = Some(exec.scheduleWithFixedDelay(
        // catch EVERYTHING: scheduleWithFixedDelay silently cancels the
        // schedule on any throw — a single failed sweep must not end
        // retention for the server's lifetime
        () => try { sweep(); () } catch { case t: Throwable => lastSweepError = Some(t) },
        periodMs, periodMs, TimeUnit.MILLISECONDS))
    this
  }

  /** Topics under the root: directories carrying a registry doc. */
  def topics(): Seq[TopicConfig] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(HadoopConf.shared)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      // reserved (`_`-prefixed) dirs — txn journals, future control state —
      // are not topics and would fail TopicConfig's name validation
      .filter(s => TopicConfig.validTopicName(s.getPath.getName))
      .map(s => TopicConfig(root, s.getPath.getName, clusterSize, rangesPerToken))
      .filter(cfg => fs.exists(new Path(cfg.metadataPath)))
  }

  /** One sweep over every topic; returns per-topic deletion counts.
    * Callable directly (the façade's manual trigger) — serialized with the
    * scheduled loop. */
  def sweep(nowMs: Long = System.currentTimeMillis()): Map[String, RetentionScheduler.Sweep] =
    synchronized {
      // writer-lease gate, checked ONCE for the whole sweep: a fenced
      // driver's sweep must not delete orphans/finalize records the
      // successor still references (the per-topic CAS paths would refuse
      // individually, but vacuum's physical deletes don't CAS). Throws
      // loudly — the scheduled loop records it in lastSweepError, a manual
      // trigger surfaces it to the operator.
      WriterLease.checkWrite(root)
      // routed-commit journal recovery first (all-or-none convergence for
      // killed multi-topic fan-outs) — its staged files must be resolved
      // before the per-topic vacuums below can see them as plain orphans
      recoveredDone += routedRecover.map(f =>
        try f(nowMs) catch { case NonFatal(_) => 0 }).getOrElse(0).toLong
      // producer-transaction recovery (the Kafka coordinator's role): runs
      // with the journal recovery, before retention/vacuum — finishes torn
      // commit/abort finalizations and timeout-aborts idle transactions,
      // so marked entries always converge to plain-or-gone
      recoveredDone += (try Transactions.recover(root, nowMs)
        catch { case NonFatal(_) => 0 }).toLong
      // journal-held names computed ONCE per sweep (vacuum runs per topic;
      // per-topic listings would be O(topics × journals)). A listing error
      // leaves None — each vacuum then computes (and fails closed) itself.
      val heldAll: Option[Map[String, Set[String]]] =
        try Some(TxnJournal.heldByTopic(root)) catch { case NonFatal(_) => None }
      var reconcileClean = true
      val res = topics().map { cfg =>
        // per-topic overrides (Kafka topic configs, persisted in the root
        // doc): `retention.ms` replaces the global window for this topic;
        // `cleanup.policy=compact` exempts it from time-based deletion
        // entirely — a compacted topic's keys must survive, exactly
        // Kafka's semantics (vacuum and segment merge still run)
        val head =
          try Some(LogMetadata.read(cfg)) catch { case NonFatal(_) => None }
        // producer-txn mark GC: marks whose transaction is fully finalized
        // (directory gone) materialize into the registry — committed-class
        // clear to plain entries, aborted-class unregister — so manifests
        // revert below the txn format as transactions resolve, and the
        // finalize-record expiry below can never flip a lingering mark.
        // The head snapshot answers the (overwhelmingly common) no-marks
        // case with zero extra reads; a FAILED reconcile pass disarms
        // this sweep's record expiry (expiring a record whose marks were
        // not materialized would flip their resolution).
        reconciledDone += (try Transactions.reconcileMarks(cfg, head)
          catch { case NonFatal(_) => reconcileClean = false; 0 }).toLong
        val props = head.map(_.props).getOrElse(Map.empty[String, String])
        // defensive parse: a malformed persisted value must degrade to the
        // global window for THIS topic, never abort the sweep for all
        val window = props.get(TopicProps.RetentionMs)
          .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
          .getOrElse(retentionMs)
        // cleanup.policy may name BOTH cleaners ("compact,delete" —
        // Kafka's combined policy): each runs iff its name is present;
        // an absent prop defaults to delete-only, compact-only topics are
        // exempt from time deletion (their keys must survive)
        val compactPolicy = TopicProps.policyHas(props, "compact")
        val deletePolicy = !props.contains(TopicProps.CleanupPolicy) ||
          TopicProps.policyHas(props, "delete")
        // retention.ms = -1 is Kafka's "retention disabled" sentinel: the
        // topic is exempt from time-based deletion without flipping its
        // cleanup policy (vacuum and segment merge still run)
        val aged =
          if (!deletePolicy || window == -1L) 0
          else try PolarLog.cleanRetention(cfg, window, nowMs)
          catch { case NonFatal(_) => 0 }
        // retention.bytes (size-based retention, per partition): same
        // delete-policy gate — compact-only topics keep their keys
        val sizeCap = props.get(TopicProps.RetentionBytes)
          .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
          .filter(_ > 0L)
        val agedBySize =
          if (!deletePolicy) 0
          else sizeCap.map(cap =>
            try PolarLog.cleanRetentionBytes(cfg, cap)
            catch { case NonFatal(_) => 0 }).getOrElse(0)
        // the Kafka log-cleaner loop: compact-policy topics get their
        // clean regions rewritten to latest-per-key — but only when the
        // registry advanced since the last pass (no new commits = nothing
        // newly superseded, so the full-region read is skipped)
        // per-topic min.cleanable.dirty.ratio overrides the scheduler-wide
        // floor (kafka-configs semantics); malformed values degrade to it
        val topicMinDirty = props.get(TopicProps.MinCleanableDirtyRatio)
          .flatMap(v => scala.util.Try(v.trim.toDouble).toOption)
          .filter(r => r >= 0.0 && r <= 1.0)
          .getOrElse(minDirtyRatio)
        if (compactPolicy)
          for (c <- keyCleaner; m0 <- head) {
            // measure the max-lag deadline against the POST-trim registry:
            // a dirty segment this sweep's own retention just deleted must
            // not trigger a spurious forced pass
            val m =
              if (aged + agedBySize > 0)
                (try Some(LogMetadata.read(cfg))
                 catch { case NonFatal(_) => None }).getOrElse(m0)
              else m0
            // max.compaction.lag.ms: once the oldest dirty segment is past
            // the deadline, a pass runs even below the dirty-ratio floor
            // and even at an unadvanced version (min-lag may have excluded
            // the segment from the pass that recorded that version) — the
            // Kafka bound on tombstone/PII latency for low-churn topics
            // the deadline measures against max(maxLag, minLag): a
            // misconfigured min > max would otherwise force a pass every
            // sweep that the min-lag cut then empties — a no-op Spark job
            // per sweep, forever
            val topicMinLag = props.get(TopicProps.MinCompactionLagMs)
              .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
              .filter(_ > 0L).getOrElse(0L)
            val lagBreached = props.get(TopicProps.MaxCompactionLagMs)
              .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
              .filter(_ >= 1L)
              .exists(lag => oldestDirtyOf.flatMap(f => f(m))
                .exists(oldest => nowMs - oldest > math.max(lag, topicMinLag)))
            if (lagBreached ||
                (!lastCleanedVersion.get(cfg.topic).contains(m.version) &&
                  dirtyRatioOf.forall(f => f(m) >= topicMinDirty))) {
              // record the POST-clean version, and only on SUCCESS: a
              // failed pass must retry next sweep (an idle topic with a
              // dirty region would otherwise stay uncompacted forever).
              // A produce landing DURING the clean is folded into the
              // recorded version and gets cleaned one commit later —
              // eventual, like Kafka's cleaner passes.
              // A min-lag-TRUNCATED pass (young dirt was excluded and is
              // still uncleaned) records nothing: the version gate would
              // otherwise skip every later sweep of an idle topic, and
              // the within-lag records — tombstones included — would
              // never compact after the lag elapses. Retries stay cheap:
              // a pass whose truncated region holds no dirty files exits
              // on registry arithmetic alone.
              try {
                if (lagBreached) forcedKeyCleaner.getOrElse(c)(cfg) else c(cfg)
                val after = LogMetadata.read(cfg)
                val lagTruncated = topicMinLag > 0L &&
                  newestDirtyOf.flatMap(f => f(after))
                    .exists(newest => nowMs - newest < topicMinLag)
                if (!lagTruncated)
                  lastCleanedVersion(cfg.topic) = after.version
              } catch { case NonFatal(_) => () }
            }
          }
        // dataGraceMs = periodMs makes reclamation MODIFICATION-TIME
        // gated, not ordering-gated: a superseded original survives at
        // least one full period after its last write regardless of when
        // sweeps happen to run, so any reader that planned against the
        // pre-compaction registry gets a bounded, configurable window
        // (previously grace was only implied by sweep ordering — a query
        // outliving one period could hit FileNotFound mid-scan)
        val orphans =
          try PolarLog.vacuum(cfg, nowMs = nowMs, dataGraceMs = periodMs,
            heldOverride = heldAll.map(_.getOrElse(cfg.topic, Set.empty)))
          catch { case NonFatal(_) => 0 }
        // compaction runs AFTER vacuum: a deferred-delete compactor's
        // superseded originals survive as unregistered orphans until a
        // LATER sweep's vacuum passes their grace window
        val mer = compactor.map(c =>
          try c(cfg) catch { case NonFatal(_) => 0 }).getOrElse(0)
        cfg.topic -> RetentionScheduler.Sweep(aged + agedBySize, orphans, mer)
      }.toMap
      // finalize-record expiry LAST — after every topic's reconcileMarks
      // pass, so an expired record can never change a surviving mark's
      // resolution (the marks referencing expired ids are already
      // materialized into the registries above). A sweep where ANY
      // topic's reconcile failed skips expiry entirely: that topic's
      // marks may still need their records.
      if (reconcileClean)
        try Transactions.expireIdleRecords(root, nowMs): Unit
        catch { case NonFatal(_) => () }
      mergedDone += res.valuesIterator.map(_.merged.toLong).sum
      sweepsDone += 1
      lastSweep = res
      res
    }

  def sweeps: Long = sweepsDone
  def merged: Long = mergedDone
  def recovered: Long = recoveredDone
  def reconciled: Long = reconciledDone
  def last: Map[String, RetentionScheduler.Sweep] = lastSweep
  def lastError: Option[Throwable] = lastSweepError

  override def close(): Unit = synchronized {
    scheduled.foreach(_.cancel(false))
    scheduled = None
    exec.shutdownNow(): Unit
  }
}

object RetentionScheduler {
  /** 168 h — the reference's `logRetentionDuration` default
    * (`internal/conf/config.go:291-302`). */
  val DefaultRetentionMs: Long = 168L * 3600 * 1000
  /** 5 min — the reference cleaner's loop period
    * (`internal/data/datalog_cleaner.go:16-37`). */
  val DefaultPeriodMs: Long = 5L * 60 * 1000

  /** One topic's sweep report. `agedDeleted` counts segments REMOVED from
    * the registry by age/size retention — physically deleted on eager
    * topics, deferred to the `pendingDeletes` ledger on
    * `file.delete.delay.ms` topics (reclaimed by a later sweep's vacuum
    * once due; until then the topic's `pending_deletes` view explains the
    * disk-vs-registry gap). */
  final case class Sweep(agedDeleted: Int, orphansDeleted: Int, merged: Int = 0)
}
