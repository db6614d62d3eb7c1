package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A closed user session assembled from the event stream. */
final case class UserSession(
    partitionKey: String,
    n_events: Long,
    first_ts: java.sql.Timestamp,
    last_ts: java.sql.Timestamp,
    duration_secs: Long)

private final case class SessionState(
    n: Long, firstMicros: Long, lastMicros: Long)

/** One packed document: shard, assigned context-window id, token count. */
final case class PackedDoc(shard: Long, window: Long, doc_id: Long, nt: Long)

final case class Scd2Change(
    partitionKey: String, attr: String, valid_from: java.sql.Timestamp)

private final case class Scd2State(lastAttr: String)

/** One flagged event: its key, measure, time, and how many prior events
  * the flagging statistics were built from. */
final case class AnomalyFlag(
    partitionKey: String, x: Long, ts: java.sql.Timestamp, n_prev: Long)

private final case class ZScoreState(n: Long, s: Long, q: Long)

/** One extracted state transition of a key. */
final case class Transition(partitionKey: String, prev_type: String, next_type: String)

private final case class LastState(t: String)

/** One completed funnel conversion: the key and the timestamp of the event
  * that closed the final stage. */
final case class FunnelConversion(
    partitionKey: String, converted_at: java.sql.Timestamp)

private final case class FunnelState(stage: Int)

private final case class PackState(cum: Long)

/** One admitted record of a quota-capped key: the key, the record's value,
  * and its 1-based admission rank within the key. */
final case class AdmittedRecord(partitionKey: String, value: String, seq: Long)

private final case class QuotaState(n: Long)

/**
 * Event-time analytics over the polar stream — the Structured Streaming
 * layer the reference leaves to its consumers (SURVEY §2 Table B
 * "streaming"): watermarked tumbling-window aggregation, and custom
 * session state via `flatMapGroupsWithState` (the reference's closest
 * analog being per-group reader state, `internal/consuming/
 * group_read_queue.go` — here generalized to user-defined state machines).
 *
 * Both operate on the consume-side DataFrame (`PolarStream.read` or
 * `PolarLog.consume`), so they run identically over a live stream or a
 * batch replay of the log — watermarks bound state at 100 TB: late
 * events beyond the watermark are dropped rather than growing state.
 */
object StreamAnalytics {

  /** Tumbling-window counts/sums per key column with a watermark. In batch
    * mode (replay) the same plan computes the final windows exactly. */
  def windowedCounts(
      events: DataFrame,
      keyCol: String,
      windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("timestamp", watermark)
      else events
    withWm
      .groupBy(window(col("timestamp"), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(s"window.start").as("window_start"), col(keyCol), col("n"))
  }

  /** Streaming exact dedup: drop records whose `keyCols` were already seen,
    * with state bounded by the watermark (a duplicate arriving later than
    * `watermark` after the original is no longer caught — the bounded-state
    * tradeoff every 100 TB streaming dedup must make). In batch replay the
    * same call is a plain dropDuplicates. */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("timestamp", watermark)
        .dropDuplicates(keyCols :+ "timestamp")
    else events.dropDuplicates(keyCols :+ "timestamp")

  /**
   * Streaming INCREMENTAL dedup: drop stream records whose `keyCols`
   * already exist in a STATIC corpus (the persisted key set a production
   * pipeline keeps between ingests — [[graft.operators.Dedup.exactIncrement]]
   * on the stream), then watermark-bounded within-stream dedup for
   * cross-batch duplicates. Stream-static anti is expressed as the
   * supported left-outer join + null filter; the corpus side is a key
   * projection that Spark broadcasts or re-reads per micro-batch, never
   * state. At 100 TB the corpus key set is a compact parquet of hashes
   * and the per-batch join is broadcast (small increment) or
   * shuffle-on-key (big backfill) — either way corpus text never moves.
   */
  def dedupAgainstCorpus(
      stream: DataFrame,
      corpusKeys: DataFrame,
      keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame = {
    val marked = corpusKeys
      .select(keyCols.map(col): _*).dropDuplicates(keyCols)
      .withColumn("__seen", lit(1))
    val fresh = stream.join(marked, keyCols, "left_outer")
      .filter(col("__seen").isNull)
      .drop("__seen")
    dedupStream(fresh, keyCols, watermark)
  }

  /** Session assembly with a gap timeout: events of a key within
    * `gapSeconds` of each other belong to one session; a quiet gap (or
    * end-of-stream) closes it. State is per-key and bounded by the timeout. */
  def sessionize(
      events: Dataset[org.apache.spark.sql.Row],
      gapSeconds: Long = 1800): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("partitionKey"), col("timestamp"))
      .as[(String, java.sql.Timestamp)]
    val streaming = events.isStreaming // resolve outside the task closure

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[SessionState]) =>
          // sort within group: batch replay delivers unordered.
          // full-micros conversion — getTime alone truncates to millis
          val times = rows.map { r =>
            val ts = r._2
            ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
          }.toSeq.sorted
          val sessions = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          var cur = state.getOption
          times.foreach { t =>
            cur match {
              case Some(s) if t - s.lastMicros <= gapSeconds * 1000000L =>
                cur = Some(s.copy(n = s.n + 1, lastMicros = t))
              case Some(s) =>
                sessions += closed(key, s)
                cur = Some(SessionState(1, t, t))
              case None =>
                cur = Some(SessionState(1, t, t))
            }
          }
          cur match {
            case Some(s) if !state.hasTimedOut =>
              // batch mode: flush the trailing session; streaming keeps it
              // open in state awaiting more events
              if (streaming) state.update(s)
              else { sessions += closed(key, s); state.remove() }
            case _ => state.remove()
          }
          sessions.iterator
      }
  }

  private def closed(key: String, s: SessionState): UserSession =
    UserSession(key, s.n,
      tsFromMicros(s.firstMicros),
      tsFromMicros(s.lastMicros),
      (s.lastMicros - s.firstMicros) / 1000000L)

  /** Micros-exact Timestamp: millis via the constructor, sub-milli micros
    * restored through setNanos (the constructor alone truncates to millis). */
  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming sequence packing: documents are laid end-to-end into fixed
    * `contextLen` windows PER SHARD as they arrive; the running token
    * cursor lives in `flatMapGroupsWithState` state, so packing continues
    * seamlessly across micro-batches — window ids only ever grow, no
    * window is reopened. Within a micro-batch each shard's group packs in
    * (content-hash, id) order, identical to the batch packer
    * ([[graft.operators.Curation.packSequences]]); a single-batch replay
    * therefore equals the batch result exactly. State is one counter per
    * shard — O(shards) regardless of corpus size, the right stateful
    * footprint at 100 TB.
    *
    * `docs` needs columns `doc_id` (long) and `nt` (long token count). */
  def packStream(
      docs: DataFrame,
      contextLen: Int,
      shards: Int = 8): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs.select(
        graft.operators.Sampling.hashBucket(col("doc_id"), shards).as("shard"),
        graft.operators.Dedup.md5Hash60(col("doc_id").cast("string")).as("h"),
        col("doc_id").cast("long").as("doc_id"),
        col("nt").cast("long").as("nt"))
      .as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (shard, rows, state: GroupState[PackState]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = rows.toSeq.sortBy { case (_, h, id, _) => (h, id) }.map {
            case (_, _, id, nt) =>
              val win = cum / contextLen // floor: cum and contextLen >= 0
              cum += nt
              PackedDoc(shard, win, id, nt)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }

  /**
   * Streaming SCD2 change capture: emit a change row whenever a key's
   * tracked attribute differs from its previous value — the incremental
   * form of [[graft.operators.Analytics.scd2Intervals]], maintained ON THE
   * STREAM. State per key is O(1): just the last attribute value; change
   * rows append immediately, so downstream interval assembly (the lead()
   * window over change rows) stays a cheap batch view over the captured
   * log.
   *
   * Cross-batch ordering: per log partition the source delivers offset
   * order, which the shared-topic produce made (timestamp, value) order —
   * so only WITHIN a micro-batch does the group need sorting (batch
   * replay delivers unordered; sort key mirrors the produce order).
   *
   * `events` needs (partitionKey, timestamp, value); `attr` is the tracked
   * attribute expression (compared as a string).
   */
  /**
   * Streaming count-min sketch: maintain the d×w counter grid of
   * [[graft.operators.TextAnalysis.cmsHeavyHitters]] incrementally across
   * micro-batches — the textbook "sketch the stream" deployment. State is
   * BOUNDED at d·w counter groups no matter how much flows through the
   * topic (this is the whole point of sketching: the multi-TB stream
   * compresses to a few KB of mergeable cells), so complete-mode output
   * is safe and every cell is exactly the batch grid's value once the
   * stream drains — which is precisely what the oracle checks.
   */
  def cmsCells(events: DataFrame, term: Column, d: Int = 4, w: Int = 256): DataFrame =
    events
      .select(term.cast("string").as("term"),
        explode(typedLit((0 until d).toList)).as("j"))
      .select(col("j"),
        pmod(graft.operators.Dedup.md5Hash60(
          concat(col("j").cast("string"), lit(":"), col("term"))), lit(w.toLong)).as("b"))
      .groupBy(col("j"), col("b"))
      .agg(count(lit(1)).as("s"))

  /**
   * Streaming HyperLogLog registers: maintain the 4096-register sketch of
   * [[graft.functions.Hll60]] incrementally — per-bucket MAX(rho) across
   * micro-batches, the other textbook stream sketch next to [[cmsCells]].
   * State is bounded at 4096 register groups regardless of stream volume,
   * max is order-insensitive and mergeable, and the drained registers are
   * exactly the batch sketch's (the oracle rebuilds every register from
   * the raw table). rho is computed with pure integer bit ops
   * (`1 + bit_count(lowestSetBit - 1)` = trailing zeros + 1) so no float
   * can disagree across engines.
   */
  def hllRegisters(events: DataFrame, key: Column): DataFrame = {
    val h = graft.operators.Dedup.md5Hash60(key.cast("string"))
    events.select(h.as("h"))
      .select(col("h").bitwiseAND(lit(4095L)).as("bucket"),
        shiftright(col("h"), 12).as("x"))
      .select(col("bucket"),
        when(col("x") === 0L, lit(49))
          .otherwise(bit_count(col("x").bitwiseAND(-col("x")) - 1) + 1).as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("mj"))
  }

  /**
   * Streaming ONLINE anomaly detection: per-key running z-score with
   * integer-exact state. Each event is judged against the mean/variance of
   * everything BEFORE it (the online-detector contract — no lookahead), so
   * the run is a pure fold over the per-key event order and the batch
   * oracle replays it with prefix-window sums. The z-test is evaluated in
   * exact integer arithmetic — `(n·x − s)² > k²·(n·q − s²)` over the raw
   * running sums — so there is no float threshold to diverge on.
   *
   * State per key is three longs (n, Σx, Σx²) — O(1), watermark-free,
   * mergeable; at 100 TB the state store holds |keys|×24 bytes, and the
   * same fold shape would take a decayed/windowed variant without changing
   * the plan. Within a micro-batch the group is sorted by (event-time,
   * payload) — the produce order of the topic — and across batches offset
   * order preserves per-key event-time order, same contract as
   * [[scd2Stream]].
   */
  def anomalyStream(
      events: DataFrame,
      measure: Column,
      k2: Long = 9,
      minPrev: Long = 8): Dataset[AnomalyFlag] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("partitionKey").cast("string"), col("timestamp"),
        col("value").cast("string"), measure.cast("long"))
      .as[(String, java.sql.Timestamp, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[ZScoreState, AnomalyFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[ZScoreState]) =>
          val sorted = rows.toSeq.sortBy { case (_, ts, v, _) =>
            (ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L, v)
          }
          var st = state.getOption.getOrElse(ZScoreState(0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyFlag]
          sorted.foreach { case (_, ts, _, x) =>
            if (st.n >= minPrev) {
              val lhs = (BigInt(st.n) * x - st.s).pow(2)
              val rhs = BigInt(k2) * (BigInt(st.n) * st.q - BigInt(st.s) * st.s)
              if (lhs > rhs) out += AnomalyFlag(key, x, ts, st.n)
            }
            st = ZScoreState(st.n + 1, st.s + x, st.q + x * x)
          }
          state.update(st)
          out.iterator
      }
  }

  /**
   * Streaming TRANSITION extraction (the Markov-chain feed): per key,
   * every consecutive (prev, next) state pair in event-time order —
   * O(1) state per key (the last state only), pairs appended as they
   * stream, cross-batch continuity guaranteed by the carried state. The
   * downstream transition-matrix aggregate is |states|²-sized whether it
   * runs on the stream or in batch over the appended pairs.
   */
  def transitionStream(events: DataFrame, state: Column): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("partitionKey").cast("string"), col("timestamp"),
        col("value").cast("string"), state.cast("string"))
      .as[(String, java.sql.Timestamp, String, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[LastState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, st: GroupState[LastState]) =>
          val sorted = rows.toSeq.sortBy { case (_, ts, v, _) =>
            (ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L, v)
          }
          var last = st.getOption.map(_.t)
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          sorted.foreach { case (_, _, _, t) =>
            last.foreach(p => out += Transition(key, p, t))
            last = Some(t)
          }
          last.foreach(t => st.update(LastState(t)))
          out.iterator
      }
  }

  /**
   * Streaming FUNNEL detection: per key, a sequential state machine over
   * `stages` — the pointer advances when the current event's stage token
   * equals the next expected stage, and on completing the last stage emits
   * one [[FunnelConversion]] carrying that event's timestamp, then absorbs
   * (first conversion only). State is O(1) per key (the stage pointer —
   * an Int, not the event history), so state size is bounded by live keys
   * exactly like the reference's per-group reader state. Greedy
   * first-match semantics make the run a pure function of the per-key
   * (event-time, value) order, which is the log's per-partition produce
   * order — so the batch oracle replays it with nested first-occurrence
   * seeks. Pacing forces funnels to span micro-batch boundaries; the
   * carried pointer is the property under test.
   */
  def funnelStream(
      events: DataFrame, stage: Column, stages: Seq[String]): Dataset[FunnelConversion] = {
    require(stages.nonEmpty, "funnelStream needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("partitionKey").cast("string"), col("timestamp"),
        col("value").cast("string"), stage.cast("string"))
      .as[(String, java.sql.Timestamp, String, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelConversion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, st: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy { case (_, ts, v, _) =>
            (ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L, v)
          }
          var stagePtr = st.getOption.map(_.stage).getOrElse(0)
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelConversion]
          sorted.foreach { case (_, ts, _, tok) =>
            if (stagePtr < stages.length && tok == stages(stagePtr)) {
              stagePtr += 1
              if (stagePtr == stages.length) out += FunnelConversion(key, ts)
            }
          }
          st.update(FunnelState(stagePtr))
          out.iterator
      }
  }

  /**
   * Streaming per-key quota ADMISSION (the ingest-time twin of
   * `Curation.domainCap`): each key admits its first `cap` records in
   * event-time order and drops the rest — the C4/RefinedWeb per-domain
   * frequency cap enforced AT THE LOG, before dropped documents ever cost
   * downstream compute or storage. State is O(1) per key (the admission
   * counter), carried across micro-batch boundaries, so a key that fills
   * its quota in batch 1 admits nothing in batch 9. Deterministic when
   * per-key event times are strictly increasing (produce orders offsets
   * by timestamp within a partition), which lets the batch oracle replay
   * the admitted set as a row_number cap.
   */
  def quotaAdmit(events: DataFrame, cap: Long): Dataset[AdmittedRecord] = {
    require(cap >= 0, s"quotaAdmit needs cap >= 0, got $cap")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("partitionKey").cast("string"), col("timestamp"),
        col("value").cast("string"))
      .as[(String, java.sql.Timestamp, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[QuotaState, AdmittedRecord](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, st: GroupState[QuotaState]) =>
          val sorted = rows.toSeq.sortBy { case (_, ts, v) =>
            (ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L, v)
          }
          var n = st.getOption.map(_.n).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[AdmittedRecord]
          sorted.iterator.takeWhile(_ => n < cap).foreach { case (_, _, v) =>
            n += 1
            out += AdmittedRecord(key, v, n)
          }
          st.update(QuotaState(n))
          out.iterator
      }
  }

  def scd2Stream(events: DataFrame, attr: Column): Dataset[Scd2Change] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("partitionKey").cast("string"), col("timestamp"),
        col("value").cast("string"), attr.cast("string"))
      .as[(String, java.sql.Timestamp, String, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Scd2State, Scd2Change](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[Scd2State]) =>
          val sorted = rows.toSeq.sortBy { case (_, ts, v, _) =>
            (ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L, v)
          }
          var last = state.getOption.map(_.lastAttr)
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Change]
          sorted.foreach { case (_, ts, _, a) =>
            if (!last.contains(a)) { out += Scd2Change(key, a, ts); last = Some(a) }
          }
          last.foreach(a => state.update(Scd2State(a)))
          out.iterator
      }
  }
}
