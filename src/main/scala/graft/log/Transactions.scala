package graft.log

import org.apache.hadoop.fs.Path

/**
 * Producer transactions (Kafka EOS parity): multiple produces — across
 * topics and across jobs — under one `transactional.id`, atomically visible
 * to `isolation.level=read_committed` readers at the commit point, all
 * reclaimed on abort.
 *
 * The reference has no transactions (its produce path is per-request,
 * `/root/reference/internal/producing/server.go:126-151`); this is the
 * natural completion of the routed-commit journal machinery
 * ([[TxnJournal]]), reshaped to Kafka's producer-transaction model:
 *
 *  - Transactional produces REGISTER normally (dense offsets from the
 *    shared tails, one CAS per produce — Kafka appends uncommitted records
 *    to the log the same way), but every registered [[FileEntry]] carries
 *    the transaction id ([[FileEntry.txn]]). Default
 *    (`read_uncommitted`) readers see them immediately, per Kafka.
 *  - A `read_committed` scan resolves the marked entries' transaction
 *    states at planning ([[readCommittedView]]): files of OPEN
 *    transactions are excluded and each partition's readable tail is
 *    capped at its LSO — the first offset any open transaction holds —
 *    so later-committed records never overtake an open transaction
 *    (Kafka's last-stable-offset rule). Aborted-but-unreclaimed files are
 *    excluded outright; their offsets become gaps, exactly like Kafka's
 *    aborted records.
 *  - COMMIT and ABORT race through ONE arbiter: the exclusive create of
 *    `terminal.json` ([[decideTerminal]]) — the first writer's kind
 *    stands, the loser follows it. COMMIT's marker (the commit point)
 *    then clears the marks topic-by-topic through the normal CAS and
 *    drops the transaction directory. A crash mid-finalize is safe:
 *    readers treat marked entries whose transaction shows a commit marker
 *    — or whose directory is GONE (abort removes entries before the
 *    directory, so surviving marks can only be committed) — as committed;
 *    the sweep's [[recover]] finishes the mark-clearing.
 *  - ABORT wins the arbiter, unregisters every marked entry via CAS
 *    (offsets stay consumed — a dense-offset gap, handled by the
 *    admission walks' gap jumps), reclaims the files (through the
 *    `file.delete.delay.ms` ledger when the topic defers deletes), and
 *    drops the directory.
 *  - TIMEOUT: the retention sweep aborts open transactions idle past
 *    their `timeoutMs` (Kafka's `transaction.timeout.ms`, coordinator
 *    role). Produces heartbeat the transaction, so a long-running
 *    multi-produce transaction is not aborted underneath itself.
 *  - FENCING: `begin` on an id with a live transaction aborts it and
 *    mints a strictly larger epoch (wall-clock-anchored, so epochs stay
 *    monotone across full finalize cycles); produces and commits verify
 *    their handle's epoch — a zombie producer's writes refuse loudly
 *    (Kafka's producer-epoch fencing).
 *
 * State lives under `{root}/_polar_txn_producers/<hex(id)>/`:
 * `open.json` (epoch, timeout) → `t-<topic>.json` touch files (written
 * BEFORE each produce's CAS, so every marked entry's topic is always
 * discoverable) → `terminal.json` (exclusive-create arbiter, kind
 * commit|abort) → directory removed (open.json first, so a concurrent
 * [[state]] never reads a finalizing txn as freshly open).
 */
object Transactions {

  def dir(root: String): String = s"$root/_polar_txn_producers"

  /** Kafka's `transaction.timeout.ms` default. */
  val DefaultTimeoutMs: Long = 60000L

  final case class TxnHandle(root: String, txnId: String, epoch: Long)

  sealed trait TxnState
  /** Live: produces may stage; `ageAnchorMs` is the newest progress mark
    * (open.json or the produce heartbeat), what [[recover]]'s timeout is
    * measured against. */
  final case class Open(epoch: Long, ageAnchorMs: Long, timeoutMs: Long)
      extends TxnState
  /** Commit point durable; mark-clearing may still be pending. */
  case object Committed extends TxnState
  /** Abort decided; entry removal / file reclamation may be pending. */
  case object Aborted extends TxnState
  /** No directory: never began, or fully finalized. Marked entries that
    * still reference such an id are COMMITTED leftovers (abort removes
    * entries before it removes the directory). */
  case object Unknown extends TxnState

  private def txnPath(root: String, txnId: String) =
    new Path(s"${dir(root)}/${LogMetadata.hexEncode(txnId)}")

  private def fsOf(p: Path) = p.getFileSystem(HadoopConf.shared)

  private def writeFile(p: Path, text: String, overwrite: Boolean): Unit = {
    val fs = fsOf(p)
    val out = fs.create(p, overwrite)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSmall(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  // same-driver serialization of begin/commit/abort/recover per id — the
  // driver is the only metadata authority (SURVEY §7.1), so this makes the
  // marker writes race-free where they can race at all; the deterministic
  // abort-wins rule in [[state]] covers exotic cross-process overlap
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String, txnId: String): Object =
    locks.computeIfAbsent(s"$root#$txnId", _ => new Object)

  private val KindRe = """"kind"\s*:\s*"(\w+)"""".r

  /** The kind standing in `terminal.json`, retried briefly: a just-created
    * marker may be momentarily empty (create precedes the content write). */
  private def terminalKind(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): Option[String] = {
    var attempt = 0
    while (attempt < 5) {
      try {
        if (!fs.exists(p)) return None
        val k = KindRe.findFirstMatchIn(readSmall(fs, p)).map(_.group(1))
        if (k.isDefined) return k
      } catch { case _: java.io.IOException => () }
      attempt += 1
      Thread.sleep(10)
    }
    None
  }

  /** The ATOMIC commit-vs-abort arbiter: exclusive-create `terminal.json`
    * with `kind`; the FIRST writer's kind stands and is returned — a loser
    * reads the winner's kind and must follow it. This closes the
    * commit-racing-timeout-abort window: once either side's marker is
    * durable the other side cannot half-apply its own decision. (Same-JVM
    * races are additionally serialized by [[lockFor]]; the exclusive
    * create is the cross-process guard.) */
  private def decideTerminal(
      root: String, txnId: String, kind: String, reason: String): String = {
    val p = new Path(txnPath(root, txnId), "terminal.json")
    val fs = fsOf(p)
    try {
      val out = fs.create(p, false)
      try out.write(
        (s"""{"format":1,"kind":"$kind","reason":"$reason",""" +
          s""""ms":${System.currentTimeMillis()}}""").getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      kind
    } catch {
      case _: java.io.IOException => terminalKind(fs, p).getOrElse(kind)
    }
  }

  def state(root: String, txnId: String): TxnState = {
    val d = txnPath(root, txnId)
    val fs = fsOf(d)
    var attempt = 0
    while (true) {
      try {
        if (!fs.exists(d)) return Unknown
        terminalKind(fs, new Path(d, "terminal.json")) match {
          case Some("commit") => return Committed
          case Some(_) => return Aborted
          case None =>
            val openP = new Path(d, "open.json")
            if (!fs.exists(openP)) {
              // finalize deletes open.json BEFORE the directory, so this
              // state is either a torn begin (nothing staged) or a
              // finalize already past its mark-resolution — Aborted is
              // safe for both (recover's Aborted handling is idempotent)
              return if (fs.exists(d)) Aborted else Unknown
            }
            val text = readSmall(fs, openP)
            def longOf(name: String, dflt: Long) =
              s""""$name"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(text)
                .map(_.group(1).toLong).getOrElse(dflt)
            val anchor = (Seq(fs.getFileStatus(openP).getModificationTime) ++
              (if (fs.exists(new Path(d, "hb")))
                Seq(fs.getFileStatus(new Path(d, "hb")).getModificationTime)
              else Seq.empty)).max
            return Open(longOf("epoch", 1L), anchor, longOf("timeoutMs", DefaultTimeoutMs))
        }
      } catch {
        // a concurrent finalize can delete files between the probes: if
        // the directory itself is gone the answer is Unknown; a still-
        // present directory retries (transient), then propagates
        case e: java.io.IOException =>
          if (!(try fs.exists(d) catch { case _: java.io.IOException => true }))
            return Unknown
          attempt += 1
          if (attempt >= 5) throw e
          Thread.sleep(10L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Start (or fence-and-restart) the transaction `txnId`. An existing
    * open transaction under this id is ABORTED first (the new producer
    * incarnation fences the zombie); unfinalized terminal states are
    * finalized. The minted epoch strictly exceeds every earlier one. */
  def begin(
      root: String,
      txnId: String,
      timeoutMs: Long = DefaultTimeoutMs): TxnHandle =
    lockFor(root, txnId).synchronized {
      require(txnId.nonEmpty && txnId.length <= 120,
        s"transactional.id must be 1-120 chars, got ${txnId.length}")
      require(timeoutMs > 0, s"transaction timeout must be positive, got $timeoutMs")
      val prevEpoch = state(root, txnId) match {
        case Open(e, _, _) =>
          // fence the zombie — but an already-won commit stands (the
          // arbiter decides; a fencing begin must not roll back a commit
          // whose marker landed first)
          decideTerminal(root, txnId, "abort", "fenced") match {
            case "commit" => finalizeCommit(root, txnId)
            case _ => finalizeAbort(root, txnId)
          }
          e
        case Committed => finalizeCommit(root, txnId); 0L
        case Aborted => finalizeAbort(root, txnId); 0L
        case Unknown => 0L
      }
      // monotone across full finalize cycles (the directory is gone, so a
      // stored epoch cannot carry): wall-clock floor, bumped past any
      // same-millisecond predecessor
      val epoch = math.max(prevEpoch + 1, System.currentTimeMillis())
      val d = txnPath(root, txnId)
      fsOf(d).mkdirs(d)
      writeFile(new Path(d, "open.json"),
        s"""{"format":1,"epoch":$epoch,"timeoutMs":$timeoutMs,""" +
          s""""startMs":${System.currentTimeMillis()}}""", overwrite = true)
      TxnHandle(root, txnId, epoch)
    }

  /** Produce-side guard: the transaction must be open under exactly the
    * handle's epoch. Refreshes the heartbeat so the timeout measures from
    * last progress. Throws with a fencing-shaped message otherwise. */
  def requireOpen(root: String, txnId: String, epoch: Long): Unit =
    state(root, txnId) match {
      case Open(e, _, _) if e == epoch =>
        writeFile(new Path(txnPath(root, txnId), "hb"), "1", overwrite = true)
      case Open(e, _, _) => throw new IllegalStateException(
        s"producer fenced: transactional.id '$txnId' was re-begun " +
          s"(epoch $e, this producer holds $epoch)")
      case other => throw new IllegalStateException(
        s"transactional.id '$txnId' is not open (state: $other); " +
          "call Transactions.begin first")
    }

  /** Record (durably, BEFORE the produce's CAS) that this transaction
    * stages into `topic` — what commit/abort/recovery enumerate. */
  def touchTopic(root: String, txnId: String, topic: String): Unit = {
    require(TopicConfig.validNewTopicName(topic),
      s"invalid transactional topic '$topic'")
    val p = new Path(txnPath(root, txnId), s"t-$topic.json")
    val fs = fsOf(p)
    if (!fs.exists(p)) writeFile(p, "{}", overwrite = true)
  }

  private def touchedTopics(root: String, txnId: String): Seq[String] = {
    val d = txnPath(root, txnId)
    val fs = fsOf(d)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("t-") && n.endsWith(".json"))
      .map(_.stripPrefix("t-").stripSuffix(".json"))
  }

  private def topicCfg(root: String, topic: String): Option[TopicConfig] =
    LogMetadata.readIfExists(TopicConfig(root, topic)).map(m =>
      TopicConfig(root, topic, m.clusterSize, m.rangesPerToken))

  private def casRetry(cfg: TopicConfig)(f: LogMetadata => LogMetadata): Unit =
    LogMetadata.casWithRetry(cfg, maxAttempts = 8)(f)

  /** Make the transaction's produces durable-visible to `read_committed`:
    * write the commit point, clear the marks, drop the directory. The
    * commit point alone already decides visibility (readers resolve marked
    * entries against it), so a crash anywhere past it converges via
    * [[recover]]. */
  def commit(h: TxnHandle): Unit = lockFor(h.root, h.txnId).synchronized {
    state(h.root, h.txnId) match {
      case Open(e, _, _) if e == h.epoch =>
        // the arbiter decides: if a timeout abort won the race, its
        // reclamation may already be running — surface it, never
        // half-apply a commit over it
        decideTerminal(h.root, h.txnId, "commit", "explicit") match {
          case "commit" => finalizeCommit(h.root, h.txnId)
          case _ => throw new IllegalStateException(
            s"transaction '${h.txnId}' was aborted (timed out?) before the " +
              "commit point landed; its produces are rolled back")
        }
      case Open(e, _, _) => throw new IllegalStateException(
        s"producer fenced: transactional.id '${h.txnId}' was re-begun " +
          s"(epoch $e, this producer holds ${h.epoch})")
      case Committed => finalizeCommit(h.root, h.txnId) // idempotent replay
      case other => throw new IllegalStateException(
        s"cannot commit transaction '${h.txnId}' in state $other")
    }
  }

  /** Roll the transaction back: every produce it staged is unregistered
    * and reclaimed; offsets stay consumed (gaps). Idempotent. */
  def abort(h: TxnHandle): Unit = lockFor(h.root, h.txnId).synchronized {
    state(h.root, h.txnId) match {
      case Open(e, _, _) if e == h.epoch =>
        decideTerminal(h.root, h.txnId, "abort", "explicit") match {
          case "commit" => throw new IllegalStateException(
            s"transaction '${h.txnId}' already committed; abort is impossible")
          case _ => finalizeAbort(h.root, h.txnId)
        }
      case Open(e, _, _) => throw new IllegalStateException(
        s"producer fenced: transactional.id '${h.txnId}' was re-begun " +
          s"(epoch $e, this producer holds ${h.epoch})")
      case Aborted => finalizeAbort(h.root, h.txnId) // finish a torn abort
      case Committed => throw new IllegalStateException(
        s"transaction '${h.txnId}' already committed; abort is impossible")
      case Unknown => () // fully finalized or never began — nothing staged
    }
  }

  /** Clear this transaction's marks in one topic (entries become plain
    * committed segments) — the per-topic commit-finalize op, also the
    * produce path's self-heal when a commit raced an in-flight produce. */
  private[graft] def clearMarks(cfg: TopicConfig, txnId: String): Unit =
    casRetry(cfg) { cur =>
      cur.copy(filesByPart = cur.filesByPart.map { case (p, fs) =>
        p -> (if (fs.exists(_.txn.contains(txnId)))
          fs.map(f => if (f.txn.contains(txnId)) f.copy(txn = None) else f)
        else fs)
      })
    }

  /** Marks resolved → open.json deleted → directory deleted. The explicit
    * open.json delete keeps [[state]] deterministic under a concurrent
    * recursive delete: no observable window reads a finalizing txn as
    * freshly Open. */
  private def dropDir(root: String, txnId: String): Unit = {
    val d = txnPath(root, txnId)
    val fs = fsOf(d)
    try { val p = new Path(d, "open.json"); if (fs.exists(p)) fs.delete(p, false) }
    catch { case _: java.io.IOException => () }
    if (fs.exists(d)) fs.delete(d, true): Unit
  }

  private def finalizeCommit(root: String, txnId: String): Unit = {
    touchedTopics(root, txnId).foreach { t =>
      topicCfg(root, t).foreach(clearMarks(_, txnId))
    }
    dropDir(root, txnId)
  }

  /** Unregister and reclaim every entry `txnId` marked in `cfg` — the
    * per-topic abort op, also the produce path's compensation when a
    * commit discovers it was fenced mid-CAS. Honors the topic's
    * `file.delete.delay.ms` (reclaim through the pendingDeletes ledger). */
  private[graft] def unregisterMarked(cfg: TopicConfig, txnId: String): Unit = {
    var removed: Vector[FileEntry] = Vector.empty
    var delayMs = 0L
    casRetry(cfg) { cur =>
      removed = cur.filesByPart.valuesIterator.flatten
        .filter(_.txn.contains(txnId)).toVector
      delayMs = PolarLog.fileDeleteDelayMs(cur.props)
      val next = cur.copy(filesByPart = cur.filesByPart.map { case (p, fs) =>
        p -> fs.filterNot(_.txn.contains(txnId))
      })
      if (delayMs > 0L && removed.nonEmpty) {
        val now = System.currentTimeMillis()
        next.copy(pendingDeletes = next.pendingDeletes ++ removed.map(f =>
          PendingDelete(f.part, f.name, PolarLog.dueAt(now, delayMs))))
      } else next
    }
    if (delayMs == 0L) PolarLog.quietDelete(removed.map(_.path(cfg)))
  }

  private def finalizeAbort(root: String, txnId: String): Unit = {
    touchedTopics(root, txnId).foreach { t =>
      topicCfg(root, t).foreach(unregisterMarked(_, txnId))
    }
    dropDir(root, txnId)
  }

  /** Unregister EXACTLY these (part, name) entries and reclaim their
    * files (deferred through the ledger when the topic defers deletes) —
    * the produce path's compensation: it removes only the entries THAT
    * PRODUCE registered, never another incarnation's staging under the
    * same transactional.id. */
  private[graft] def unregisterEntries(
      cfg: TopicConfig, keys: Set[(Int, String)]): Unit = {
    if (keys.isEmpty) return
    var removed: Vector[FileEntry] = Vector.empty
    var delayMs = 0L
    casRetry(cfg) { cur =>
      removed = cur.filesByPart.valuesIterator.flatten
        .filter(f => keys((f.part, f.name))).toVector
      delayMs = PolarLog.fileDeleteDelayMs(cur.props)
      val next = cur.copy(filesByPart = cur.filesByPart.map { case (p, fs) =>
        p -> fs.filterNot(f => keys((f.part, f.name)))
      })
      if (delayMs > 0L && removed.nonEmpty) {
        val now = System.currentTimeMillis()
        next.copy(pendingDeletes = next.pendingDeletes ++ removed.map(f =>
          PendingDelete(f.part, f.name, PolarLog.dueAt(now, delayMs))))
      } else next
    }
    if (delayMs == 0L) PolarLog.quietDelete(removed.map(_.path(cfg)))
  }

  /** Every transaction directory under `root` with its state — the admin
    * inventory and [[recover]]'s worklist. */
  def list(root: String): Seq[(String, TxnState)] = {
    val d = new Path(dir(root))
    val fs = fsOf(d)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.filter(_.isDirectory)
      .flatMap(s => scala.util.Try(LogMetadata.hexDecode(s.getPath.getName)).toOption)
      .sorted
      .map(id => id -> state(root, id))
  }

  /** Drive every transaction to a terminal state: finish torn
    * commit/abort finalizations, and ABORT open transactions idle past
    * their timeout (the Kafka coordinator's timeout abort). Run by the
    * retention sweep alongside routed-journal recovery. Returns the
    * number of transactions resolved. */
  def recover(root: String, nowMs: Long = System.currentTimeMillis()): Int = {
    var resolved = 0
    list(root).foreach { case (id, st) =>
      try lockFor(root, id).synchronized {
        st match {
          case Committed => finalizeCommit(root, id); resolved += 1
          case Aborted => finalizeAbort(root, id); resolved += 1
          case Open(_, anchor, timeoutMs) if nowMs - anchor > timeoutMs =>
            // the coordinator's timeout abort goes through the arbiter: a
            // commit whose marker landed first stands and gets finished
            decideTerminal(root, id, "abort", "timeout") match {
              case "commit" => finalizeCommit(root, id)
              case _ => finalizeAbort(root, id)
            }
            resolved += 1
          case _ => () // live and within its timeout
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[polar] producer-txn recovery failed for '$id': ${e.getMessage}")
      }
    }
    resolved
  }

  /** The `read_committed` view of one topic's metadata, resolved at scan
    * planning: zero extra I/O when nothing is marked (the overwhelmingly
    * common case), one tiny state read per distinct marked transaction
    * otherwise. Open transactions cap each partition's readable tail at
    * its LSO and their files are excluded; aborted-but-unreclaimed files
    * are excluded outright; committed marks read as plain files. */
  def readCommittedView(root: String, meta: LogMetadata): LogMetadata = {
    val ids = meta.filesByPart.valuesIterator.flatten.flatMap(_.txn).toSet
    if (ids.isEmpty) return meta
    val states = ids.iterator.map(id => id -> state(root, id)).toMap
    val openIds = states.collect { case (id, _: Open) => id }.toSet
    val abortedIds = states.collect { case (id, Aborted) => id }.toSet
    if (openIds.isEmpty && abortedIds.isEmpty) return meta
    val lso: Map[Int, Long] = meta.filesByPart.map { case (p, fs) =>
      p -> fs.iterator.filter(_.txn.exists(openIds)).map(_.minOffset)
        .minOption.getOrElse(Long.MaxValue)
    }
    meta.copy(
      filesByPart = meta.filesByPart.map { case (p, fs) =>
        val cut = lso.getOrElse(p, Long.MaxValue)
        // files are offset-disjoint and the LSO is an open file's first
        // offset, so `maxOffset < cut` keeps exactly the pre-LSO files
        p -> fs.filter(f => f.maxOffset < cut && !f.txn.exists(abortedIds))
      },
      producerOffsets = meta.producerOffsets.zipWithIndex.map { case (t, p) =>
        math.min(t, lso.getOrElse(p, Long.MaxValue))
      })
  }
}
