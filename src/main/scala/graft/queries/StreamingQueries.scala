package graft.queries

import graft.Tables
import graft.log.{PolarLog, TopicConfig}
import graft.streaming.PolarStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/**
 * Streaming consume exercised through the correctness gate: events are
 * produced into a topic, streamed back through the `polar` DSv2
 * `MicroBatchStream` (paced into many micro-batches by admission control),
 * and aggregated — the oracle checks the stream delivered exactly the log,
 * no loss or duplication across batch boundaries.
 */
object StreamingQueries extends QueryRegistry {

  // Read-only streaming queries consume the SharedTopics log (dedup's
  // double-produce and pipe's destination still build their own).
  private def sharedTopic(s: org.apache.spark.sql.SparkSession, dir: String): (TopicConfig, Long) =
    SharedTopics.eventsProps(s, dir)

  /** Stateful streaming ops pin their STATE partition count from
    * `spark.sql.shuffle.partitions` at first checkpoint — and per-batch
    * state-store snapshot/commit overhead scales with that count, not with
    * the data. At gate/bench state sizes, 32 stores × batches is pure
    * overhead: 4 cuts stream_dedup ~35% and windowed_agg ~40% (measured;
    * 8 captures most of it). A deployment sizes this to state
    * volume ÷ executor memory, exactly like the reference sizes its
    * per-(group,token) reader fleet. Conf is restored after the query plans
    * (stateful checkpoints keep their pinned value thereafter). */
  private def withStatePartitions[T](
      s: org.apache.spark.sql.SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  override def all: Seq[QueryDef] = Seq(

    QueryDef(
      "stream_consume",
      (s, dir) => {
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_q").toString
        val q = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 3, 1)))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_consume").start()
        q.awaitTermination(300000)
        s.table("gate_stream_consume")
          .groupBy(col("partitionKey"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("offset"), col("part")).as("n_unique"))
      },
      Some("""
        SELECT CAST(user_id AS VARCHAR) AS partitionKey,
               COUNT(*) AS n, COUNT(*) AS n_unique
        FROM events GROUP BY user_id""")),

    QueryDef(
      "stream_changes",
      (s, dir) => {
        // STREAMING CHANGE FEED (the streaming twin of polar_changes):
        // three produces with the version captured after the first; a
        // startingVersion=v1 stream drained with AvailableNow must deliver
        // EXACTLY the (v1, head] window — the last two produces, nothing
        // from the first — and must equal the batch changesBetween plan
        // record-for-record (asserted in-gate; the oracle replays the
        // aggregate from the raw table).
        // read-only over the SHARED 4-commit fixture: a startingVersion=v1
        // stream drained with AvailableNow must deliver exactly the
        // (v1, head] window — slices 1..3, nothing from the base commit —
        // and must equal the batch changesBetween plan record-for-record.
        val (cfg, versions) = SharedTopics.segmentedEvents(s, dir)
        val v1 = versions(0)
        val root = Files.createTempDirectory("graft_stream_cf").toString
        // pace the drain into ~3 micro-batches (batch-boundary coverage)
        // scaled to the window size — a FIXED cap turns into hundreds of
        // trigger rounds at bench SF, pure scheduling overhead
        val windowN = PolarLog.tails(cfg).values.sum -
          graft.log.LogMetadata.readAt(cfg, v1).producerOffsets.sum
        val q = PolarStream.readChanges(s, cfg, startingVersion = v1,
            maxRecordsPerTrigger = Some(math.max(windowN / 3, 1L)))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_changes").start()
        q.awaitTermination(300000)
        val drained = s.table("gate_stream_changes")
        val batchFeed = PolarLog.changesBetween(s, cfg, v1)
        // drained == changesBetween exactly (offset-identified records)
        val onlyStream = drained.select(col("part"), col("offset"))
          .exceptAll(batchFeed.select(col("part"), col("offset"))).count()
        val onlyBatch = batchFeed.select(col("part"), col("offset"))
          .exceptAll(drained.select(col("part"), col("offset"))).count()
        require(onlyStream == 0 && onlyBatch == 0,
          s"stream/batch change feeds diverge: +$onlyStream/-$onlyBatch records")
        drained.groupBy(col("partitionKey").cast("long").as("user_id"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("value").cast("string")).as("n_vals"))
      },
      Some("""
        SELECT user_id, COUNT(*) AS n, COUNT(DISTINCT props) AS n_vals
        FROM events WHERE event_id % 4 <> 0 GROUP BY 1""")),

    QueryDef(
      "stream_pipe",
      (s, dir) => {
        // stream-consume from one topic, stream-produce into another
        // (the reference's broker-to-broker dataflow as a Spark pipe),
        // then check the destination log against the source table
        val (src, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_p").toString
        val dst = TopicConfig(root, "dst")
        val pipe = PolarStream.read(s, src, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 3, 1)))
          .select(col("partitionKey"), col("timestamp"), col("value"))
        val q = PolarStream.write(pipe, dst, s"$root/ckpt_pipe")
        q.awaitTermination(300000)
        PolarLog.consume(s, dst)
          .groupBy(col("partitionKey"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(user_id AS VARCHAR) AS partitionKey, COUNT(*) AS n
        FROM events GROUP BY user_id""")),

    QueryDef(
      "stream_sink",
      (s, dir) => {
        // NATIVE streaming sink (writeStream.format("polar")): multi-epoch
        // drain into a fresh topic, then assert the exactly-once
        // bookkeeping (the stream's stable id is in sinkCommits at the CAS
        // authority) and emit per-partition counts + dense-offset evidence
        // — tail and distinct-offset count must both equal the row count,
        // across epoch boundaries. All placement-replayable in DuckDB.
        val (src, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_sink").toString
        val dst = TopicConfig(root, "dst")
        val pipe = PolarStream.read(s, src, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 3, 1)))
          .select(col("partitionKey"), col("timestamp"), col("value"))
        val q = graft.log.PolarLog.produceStream(pipe, dst,
            orderBy = Seq(col("timestamp"), col("value")))
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .start()
        q.awaitTermination(300000)
        val meta = graft.log.LogMetadata.read(dst)
        require(meta.sinkCommits.contains(q.id.toString),
          s"streaming query id not in sinkCommits: ${meta.sinkCommits.keySet}")
        require(meta.sinkCommits(q.id.toString) >= 1L,
          s"expected >=2 epochs, sinkCommits=${meta.sinkCommits}")
        PolarLog.consume(s, dst)
          .groupBy(col("part"))
          .agg(count(lit(1)).as("n"),
            (max(col("offset")) + 1).as("tail"),
            countDistinct(col("offset")).as("n_off"))
      },
      Some(s"""
        WITH recs AS (SELECT CAST(user_id AS VARCHAR) AS pk FROM events),
        keys AS (SELECT DISTINCT pk FROM recs),
        ${OracleSql.murmur3H1ShortKeyCtes},
        placed AS (
          SELECT r.pk, CAST(${OracleSql.part34Sql} AS INTEGER) AS part
          FROM recs r JOIN murmur_tok t ON r.pk = t.pk)
        SELECT part, COUNT(*) AS n, COUNT(*) AS tail, COUNT(*) AS n_off
        FROM placed GROUP BY part""")),

    QueryDef(
      "stream_compacted",
      (s, dir) => withStatePartitions(s, 4) {
        // continuously-maintained KTable: the streaming twin of
        // PolarLog.consumeCompacted — latest record per key by offset,
        // upserted across micro-batches (complete mode emits the final
        // table after the AvailableNow drain). State is O(keys), one row
        // per key, the Kafka Streams table materialization shape.
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_kt").toString
        val in = PolarStream.read(s, cfg, startingOffsets = "earliest",
          maxRecordsPerTrigger = Some(math.max(n / 3, 1)))
        val q = in.filter(col("partitionKey").isNotNull)
          .groupBy(col("partitionKey").as("pk"))
          .agg(max_by(col("value"), col("offset")).as("last"))
          .filter(col("last").isNotNull)
          .select(col("pk"), col("last").cast("string").as("last_value"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("complete")
          .format("memory").queryName("gate_stream_compacted").start()
        q.awaitTermination(300000)
        s.table("gate_stream_compacted")
      },
      Some("""
        SELECT pk, last_value FROM (
          SELECT CAST(user_id AS VARCHAR) AS pk, props AS last_value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP) DESC, props DESC) AS rn
          FROM events) WHERE rn = 1""")),

    QueryDef(
      "stream_windowed_agg",
      (s, dir) => withStatePartitions(s, 4) {
        // watermarked tumbling-window aggregation over the polar stream,
        // drained with AvailableNow; oracle recomputes the same windows
        // from the raw table (hour windows are epoch-aligned in both)
        val (cfg, _) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_w").toString
        val q = graft.streaming.StreamAnalytics.windowedCounts(
            PolarStream.read(s, cfg, startingOffsets = "earliest"),
            keyCol = "partitionKey", windowLength = "1 hour",
            watermark = "10 minutes")
          // complete mode so the windows still inside the final watermark are
          // emitted too (append would hold the last 10 minutes back)
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("complete")
          .format("memory").queryName("gate_stream_window").start()
        q.awaitTermination(300000)
        s.table("gate_stream_window")
          .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("window_start"),
            col("partitionKey"), col("n"))
      },
      Some("""
        SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M') AS window_start,
               CAST(user_id AS VARCHAR) AS partitionKey,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2""")),

    QueryDef(
      "stream_dedup",
      (s, dir) => withStatePartitions(s, 4) {
        // at-least-once delivery means consumers may see duplicates; the
        // watermarked streaming dedup restores exactly-once downstream:
        // the log holds every record twice, the deduped stream once
        val root = Files.createTempDirectory("graft_stream_d").toString
        val cfg = TopicConfig(root, "events")
        val records = Tables.events(s, dir).select(
          col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"), col("props").as("value"))
        PolarLog.produce(records, cfg)
        PolarLog.produce(records, cfg) // redelivery
        val n = records.count()
        // trigger = n of 2n logged records => exactly 2 micro-batches, and
        // per-partition offset order puts the two copies of every record in
        // DIFFERENT batches: state must carry batch 1's keys to catch batch
        // 2's duplicates (the cross-batch property under test)
        val q = graft.streaming.StreamAnalytics.dedupStream(
            PolarStream.read(s, cfg, startingOffsets = "earliest",
              maxRecordsPerTrigger = Some(math.max(n, 1)))
              .select(col("partitionKey"), col("timestamp"), col("value")),
            keyCols = Seq("partitionKey", "value"), watermark = "60 days")
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_dedup").start()
        q.awaitTermination(300000)
        s.table("gate_stream_dedup")
          .groupBy(col("partitionKey")).agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(user_id AS VARCHAR) AS partitionKey, COUNT(*) AS n
        FROM events GROUP BY user_id""")),

    QueryDef(
      "stream_dedup_corpus",
      (s, dir) => withStatePartitions(s, 4) {
        // INCREMENTAL ingest on the stream: records whose (key, value)
        // already live in the standing corpus are dropped by a
        // stream-static anti (left-outer + null filter) BEFORE any state;
        // the remaining stream then passes the watermarked dedup. The
        // corpus side is a key projection — its text never moves.
        val root = Files.createTempDirectory("graft_stream_ic").toString
        val cfg = TopicConfig(root, "events")
        val records = Tables.events(s, dir).select(
          col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"), col("props").as("value"))
        PolarLog.produce(records, cfg)
        val corpus = records.filter(col("partitionKey").cast("long") % 3 =!= 0)
        val q = graft.streaming.StreamAnalytics.dedupAgainstCorpus(
            PolarStream.read(s, cfg, startingOffsets = "earliest")
              .select(col("partitionKey"), col("timestamp"), col("value")),
            corpus, keyCols = Seq("partitionKey", "value"), watermark = "60 days")
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_dedup_corpus").start()
        q.awaitTermination(300000)
        s.table("gate_stream_dedup_corpus")
          .groupBy(col("partitionKey")).agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(user_id AS VARCHAR) AS partitionKey, COUNT(*) AS n
        FROM events WHERE user_id % 3 = 0 GROUP BY user_id""")),

    QueryDef(
      "stream_sessionize",
      (s, dir) => withStatePartitions(s, 4) {
        // stateful sessionization (flatMapGroupsWithState) replayed over the
        // log in batch mode; oracle computes the same 30-min-gap sessions
        // with window functions
        val (cfg, _) = sharedTopic(s, dir)
        graft.streaming.StreamAnalytics
          .sessionize(PolarLog.consume(s, cfg).toDF(), gapSeconds = 1800)
          .groupBy(col("partitionKey"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events")).as("n_events"),
            max(col("duration_secs")).as("max_session_secs"))
      },
      Some("""
        WITH marked AS (
          SELECT user_id,
                 CAST(ts AS TIMESTAMP) AS tsv,
                 CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                        OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                           > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))),
        numbered AS (
          SELECT user_id, tsv,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY tsv
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
          FROM marked),
        per_session AS (
          SELECT user_id, session_id, COUNT(*) AS cnt,
                 (epoch_us(MAX(tsv)) - epoch_us(MIN(tsv))) // 1000000 AS dur
          FROM numbered GROUP BY user_id, session_id)
        SELECT CAST(user_id AS VARCHAR) AS partitionKey,
               COUNT(*) AS n_sessions,
               CAST(SUM(cnt) AS BIGINT) AS n_events,
               MAX(dur) AS max_session_secs
        FROM per_session
        GROUP BY user_id""")),

    QueryDef(
      "stream_session_window",
      (s, dir) => withStatePartitions(s, 4) {
        // Spark's NATIVE session_window aggregation — the codegen'd,
        // state-store-backed sibling of stream_sessionize's
        // flatMapGroupsWithState path (both live in the engine: the native
        // operator when gap-only sessions suffice, custom state when the
        // session carries bespoke logic). Windows merge while event gaps
        // are STRICTLY under 30 min (half-open interval overlap), so the
        // oracle breaks on `>= 30 MINUTE` — the one semantic difference
        // from the gaps-and-islands formulation. Pacing forces several
        // micro-batches, so cross-batch session MERGING in the state store
        // is what the gate actually exercises; window end = last event +
        // gap, subtracted back out so the oracle compares active spans.
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_sw").toString
        val q = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1)))
          .select(col("partitionKey"), col("timestamp"))
          .groupBy(col("partitionKey"),
            session_window(col("timestamp"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("complete")
          .format("memory").queryName("gate_stream_session_window").start()
        q.awaitTermination(300000)
        s.table("gate_stream_session_window")
          .groupBy(col("partitionKey"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events")).as("n_events"),
            sum(unix_micros(col("w.end")) - unix_micros(col("w.start"))
              - lit(1800000000L)).as("sum_active_us"))
      },
      Some("""
        WITH marked AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS tsv,
                 CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                        OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                           >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))),
        numbered AS (
          SELECT user_id, tsv,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY tsv
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
          FROM marked),
        per_session AS (
          SELECT user_id, sid, COUNT(*) AS cnt,
                 epoch_us(MAX(tsv)) - epoch_us(MIN(tsv)) AS active_us
          FROM numbered GROUP BY 1, 2)
        SELECT CAST(user_id AS VARCHAR) AS partitionKey,
               COUNT(*) AS n_sessions,
               CAST(SUM(cnt) AS BIGINT) AS n_events,
               CAST(SUM(active_us) AS BIGINT) AS sum_active_us
        FROM per_session GROUP BY user_id""")),

    QueryDef(
      "stream_cms",
      (s, dir) => withStatePartitions(s, 4) {
        // count-min sketch maintained ON the stream: d×w bounded state
        // across micro-batches (pacing forces several), drained with
        // AvailableNow; the oracle rebuilds every counter cell from the
        // raw table — streaming merge ≡ batch grid, cell for cell
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_cms").toString
        val q = graft.streaming.StreamAnalytics.cmsCells(
            PolarStream.read(s, cfg, startingOffsets = "earliest",
              maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF(),
            term = get_json_object(col("value").cast("string"), "$.k"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("complete")
          .format("memory").queryName("gate_stream_cms").start()
        q.awaitTermination(300000)
        s.table("gate_stream_cms").select(col("j"), col("b"), col("s"))
      },
      Some(s"""
        WITH t AS (SELECT json_extract_string(props, '$$.k') AS term FROM events),
        js AS (SELECT unnest(generate_series(0, 3)) AS j)
        SELECT js.j,
               ${OracleSql.md5Hash60("CAST(js.j AS VARCHAR) || ':' || t.term")} % 256 AS b,
               COUNT(*) AS s
        FROM t, js GROUP BY 1, 2""")),

    QueryDef(
      "stream_hll",
      (s, dir) => withStatePartitions(s, 4) {
        // HyperLogLog registers maintained ON the stream: per-bucket
        // max(rho) across micro-batches — 4096 register groups of bounded
        // state; the oracle rebuilds every register from the raw table, so
        // the check is streaming merge ≡ batch sketch, register for
        // register
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_hll").toString
        val q = graft.streaming.StreamAnalytics.hllRegisters(
            PolarStream.read(s, cfg, startingOffsets = "earliest",
              maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF(),
            key = get_json_object(col("value").cast("string"), "$.k"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("complete")
          .format("memory").queryName("gate_stream_hll").start()
        q.awaitTermination(300000)
        s.table("gate_stream_hll").select(col("bucket"), col("mj"))
      },
      Some(s"""
        WITH t AS (SELECT json_extract_string(props, '$$.k') AS term FROM events),
        h AS (SELECT ${OracleSql.md5Hash60("term")} AS h FROM t),
        r AS (SELECT CAST(h & 4095 AS BIGINT) AS bucket,
               COALESCE(1 + list_min(list_filter(generate_series(0, 47),
                 j -> ((h >> 12) >> j) & 1 = 1)), 49) AS rho
              FROM h)
        SELECT bucket, CAST(MAX(rho) AS INTEGER) AS mj FROM r GROUP BY 1""")),

    QueryDef(
      "stream_scd2",
      (s, dir) => withStatePartitions(s, 4) {
        // streaming SCD2 change capture: O(1) state per key (last attr),
        // change rows appended as they stream; pacing forces multi-batch
        // state carry. Oracle = the batch change-point query.
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_scd2").toString
        val changes = graft.streaming.StreamAnalytics.scd2Stream(
          PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF(),
          attr = get_json_object(col("value").cast("string"), "$.k").cast("int") % 4)
        val q = changes.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_scd2").start()
        q.awaitTermination(300000)
        s.table("gate_stream_scd2")
          .select(col("partitionKey"), col("attr"),
            date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"))
      },
      Some("""
        WITH e AS (
          SELECT CAST(user_id AS VARCHAR) AS partitionKey,
                 CAST(ts AS TIMESTAMP) AS tsv, props,
                 CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 4 AS VARCHAR) AS attr
          FROM events),
        c AS (SELECT *, lag(attr) OVER (PARTITION BY partitionKey ORDER BY tsv, props) AS prev
              FROM e)
        SELECT partitionKey, attr, strftime(tsv, '%Y-%m-%d %H:%M:%S.%f') AS valid_from
        FROM c WHERE prev IS NULL OR prev <> attr""")),

    QueryDef(
      "stream_markov",
      (s, dir) => withStatePartitions(s, 4) {
        // transition extraction ON the stream: per-key (prev, next) state
        // pairs with O(1) carried state — pacing forces transitions to
        // SPAN micro-batch boundaries, which is the property under test;
        // the |states|²-sized matrix aggregate runs over the appended
        // pairs. Oracle replays with a lag window per user.
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_mk").toString
        val pairs = graft.streaming.StreamAnalytics.transitionStream(
          PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF(),
          state = get_json_object(col("value").cast("string"), "$.k").cast("int") % 4)
        val q = pairs.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_markov").start()
        q.awaitTermination(300000)
        s.table("gate_stream_markov")
          .groupBy(col("prev_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, props, ts,
                 CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 4 AS VARCHAR)
                   AS st
          FROM events),
        t AS (
          SELECT st AS next_type,
                 lag(st) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), props)
                   AS prev_type
          FROM e)
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM t WHERE prev_type IS NOT NULL
        GROUP BY 1, 2""")),

    QueryDef(
      "stream_funnel",
      (s, dir) => withStatePartitions(s, 4) {
        // funnel detection ON the stream: per-key sequential stage machine
        // (stages 0→1→2 derived from the payload), O(1) carried state (the
        // stage pointer), one conversion row per key on completing the last
        // stage. Pacing forces funnels to span micro-batch boundaries; the
        // oracle replays greedy first-match with nested first-occurrence
        // seeks over the per-key (ts, value) order.
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_fn").toString
        val conv = graft.streaming.StreamAnalytics.funnelStream(
          PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF(),
          stage = get_json_object(col("value").cast("string"), "$.k").cast("int") % 3,
          stages = Seq("0", "1", "2"))
        val q = conv.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_funnel").start()
        q.awaitTermination(300000)
        s.table("gate_stream_funnel")
          .select(col("partitionKey"),
            date_format(col("converted_at"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("converted_at"))
      },
      Some("""
        WITH e AS (
          SELECT CAST(user_id AS VARCHAR) AS partitionKey,
                 CAST(ts AS TIMESTAMP) AS tsv, props,
                 CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 3 AS VARCHAR) AS st,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP), props) AS seq
          FROM events),
        s0 AS (SELECT partitionKey, MIN(seq) AS q FROM e WHERE st = '0' GROUP BY 1),
        s1 AS (SELECT e.partitionKey, MIN(seq) AS q
               FROM e JOIN s0 ON e.partitionKey = s0.partitionKey
               WHERE e.st = '1' AND e.seq > s0.q GROUP BY 1),
        s2 AS (SELECT e.partitionKey, MIN(seq) AS q
               FROM e JOIN s1 ON e.partitionKey = s1.partitionKey
               WHERE e.st = '2' AND e.seq > s1.q GROUP BY 1)
        SELECT e.partitionKey,
               strftime(e.tsv, '%Y-%m-%d %H:%M:%S.%f') AS converted_at
        FROM e JOIN s2 ON e.partitionKey = s2.partitionKey AND e.seq = s2.q""")),

    QueryDef(
      "stream_late_drop",
      (s, dir) => withStatePartitions(s, 4) {
        // WATERMARK LATE-DATA ACCOUNTING — the semantics everyone gets
        // wrong: a deliberately disordered single-partition topic (days in
        // order, hours shuffled within each day) drained in fixed-size
        // micro-batches, so the 2-hour watermark trails each day's
        // mid-stream maximum and genuinely DROPS late rows. Every term is
        // deterministic: produce order is a total order, admission fills
        // exactly `pace` records per trigger, and the watermark trajectory
        // is a pure function of batch maxima — so the oracle replays the
        // whole run: batch assignment, running-max watermark, the late
        // filter, and append-mode emission (windows closed by the final
        // watermark, which AvailableNow's trailing no-data batch flushes).
        // CALIBRATED (two arrival orders, exact multiset match): the late
        // INPUT filter in batch b uses the watermark lagged ONE batch
        // behind eviction — max(event time over batches ≤ b−2) − delay —
        // because the filter is planned from the previous batch's
        // committed watermark while StateStoreSave evicts with the
        // current one; a row dropped by that filter can never split an
        // already-emitted window, so per-window counts stay single-row.
        val root = Files.createTempDirectory("graft_stream_late").toString
        val cfg = TopicConfig(root, "late", clusterSize = 1, rangesPerToken = 1)
        val records = Tables.events(s, dir).select(
          col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"), col("props").as("value"))
        val res = PolarLog.produce(records, cfg,
          orderBy = Seq(date_trunc("day", col("timestamp")), col("value"),
            col("timestamp")))
        val pace = math.max(res.recordsWritten / 6, 1L)
        val agg = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(pace)).toDF()
          .withWatermark("timestamp", "2 hours")
          .groupBy(window(col("timestamp"), "1 hour").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("ws"), col("n"))
        val q = agg.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .format("memory").queryName("gate_stream_late").start()
        q.awaitTermination(300000)
        s.table("gate_stream_late")
          .select(date_format(col("ws"), "yyyy-MM-dd HH:mm").as("window_start"),
            col("n"))
      },
      Some("""
        WITH r AS (
          SELECT CAST(ts AS TIMESTAMP) AS tsv,
                 row_number() OVER (ORDER BY date_trunc('day', CAST(ts AS TIMESTAMP)),
                                             props, CAST(ts AS TIMESTAMP)) - 1 AS off
          FROM events),
        pace AS (SELECT GREATEST(COUNT(*) // 6, 1) AS p FROM r),
        b AS (SELECT tsv, off // p AS batch FROM r, pace),
        bm AS (SELECT batch, MAX(epoch_us(tsv)) AS mx FROM b GROUP BY 1),
        wm AS (SELECT batch,
                      MAX(mx) OVER (ORDER BY batch
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) AS prevmax
               FROM bm),
        keep AS (
          SELECT b.tsv FROM b JOIN wm USING (batch)
          WHERE wm.prevmax IS NULL
             OR epoch_us(date_trunc('hour', b.tsv)) // 1000 + 3600000
                  > wm.prevmax // 1000 - 7200000),
        agg AS (
          SELECT date_trunc('hour', tsv) AS ws, COUNT(*) AS n
          FROM keep GROUP BY 1),
        fin AS (
          SELECT MAX(epoch_us(tsv)) // 1000 - 7200000 AS fwm FROM r)
        SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, n
        FROM agg, fin
        WHERE epoch_us(ws) // 1000 + 3600000 <= fwm""")),

    QueryDef(
      "stream_topk",
      (s, dir) => withStatePartitions(s, 4) {
        // trending items ON the stream: per-key counts as bounded
        // complete-mode state (key space = the k-value domain), the top-10
        // walk in batch over the final frame — the heavy-hitters dashboard
        // shape; the exact-count twin of stream_cms's sketch.
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_tk").toString
        val q = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF()
          .select(get_json_object(col("value").cast("string"), "$.k")
            .cast("long").as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("complete")
          .format("memory").queryName("gate_stream_topk").start()
        q.awaitTermination(300000)
        s.table("gate_stream_topk")
          .orderBy(col("n").desc, col("k")).limit(10)
      },
      Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               COUNT(*) AS n
        FROM events GROUP BY 1
        ORDER BY n DESC, k LIMIT 10""")),

    QueryDef(
      "stream_restart",
      (s, dir) => withStatePartitions(s, 4) {
        // state recovery ACROSS RESTARTS: produce half the log, drain it
        // with one AvailableNow query, append the other half, then start
        // a NEW query on the SAME checkpoint — it must resume from the
        // committed offsets, process only the appendix, and surface the
        // union state. This is the exactly-once-across-restarts contract
        // (offset log + state store both recovered); the oracle is the
        // batch aggregate over the whole table.
        val ev = Tables.events(s, dir).select(
          col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"),
          col("props").as("value"),
          (col("user_id") % 2 === 0).as("even"))
        val root = Files.createTempDirectory("graft_stream_rs").toString
        val cfg = TopicConfig(root, "ev")
        PolarLog.produce(ev.filter(col("even")).drop("even"), cfg,
          orderBy = Seq(col("timestamp"), col("value")))
        def drain(): Unit = {
          val q = PolarStream.read(s, cfg, startingOffsets = "earliest")
            .select(get_json_object(col("value").cast("string"), "$.k")
              .cast("long").as("k"))
            .groupBy(col("k")).agg(count(lit(1)).as("n"))
            .writeStream
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$root/ckpt")
            .outputMode("complete")
            .format("memory").queryName("gate_stream_restart").start()
          q.awaitTermination(300000)
        }
        drain()
        PolarLog.produce(ev.filter(!col("even")).drop("even"), cfg,
          orderBy = Seq(col("timestamp"), col("value")))
        drain()
        s.table("gate_stream_restart").select(col("k"), col("n"))
      },
      Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               COUNT(*) AS n
        FROM events GROUP BY 1""")),

    QueryDef(
      "stream_quantile",
      (s, dir) => withStatePartitions(s, 4) {
        // quantile sketch maintained ON the stream: the same mergeable
        // bucket histogram as q_approx_percentile, kept as bounded
        // complete-mode state across micro-batches; the p50/p90 walk runs
        // in batch over the final bucket frame only. The streaming state
        // IS the sketch — at 100 TB this is how percentile dashboards are
        // fed without ever sorting the stream.
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_q8").toString
        val q = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF()
          .select((get_json_object(col("value").cast("string"), "$.k")
            .cast("long") / 8).cast("long").as("b"))
          .groupBy(col("b")).agg(count(lit(1)).as("c"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("complete")
          .format("memory").queryName("gate_stream_quantile").start()
        q.awaitTermination(300000)
        val w = org.apache.spark.sql.expressions.Window
        val walk = s.table("gate_stream_quantile").select(col("b"), col("c"),
          sum(col("c")).over(w.orderBy(col("b"))
            .rowsBetween(Long.MinValue, 0)).as("cum"),
          sum(col("c")).over(w.partitionBy()).as("n"))
        def est(p: Double) =
          min(when(col("cum") >= ceil(lit(p) * col("n")), (col("b") + 1) * 8))
            .cast("long")
        walk.agg(max(col("n")).as("n"),
          est(0.5).as("p50_ub"), est(0.9).as("p90_ub"))
      },
      Some("""
        WITH t AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 8 AS b
                   FROM events),
        h AS (SELECT b, COUNT(*) AS c FROM t GROUP BY 1),
        w AS (SELECT b, c, SUM(c) OVER (ORDER BY b) AS cum, SUM(c) OVER () AS n FROM h)
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cum >= ceil(0.5 * n) THEN (b + 1) * 8 END) AS BIGINT) AS p50_ub,
               CAST(MIN(CASE WHEN cum >= ceil(0.9 * n) THEN (b + 1) * 8 END) AS BIGINT) AS p90_ub
        FROM w""")),

    QueryDef(
      "stream_hnsw",
      (s, dir) => {
        // HNSW maintenance ON the stream: vectors arrive through the
        // topic in paced micro-batches, each batch lands in the persisted
        // sharded index via foreachBatch (first nonempty batch writes,
        // the rest APPEND online into reconstructed shard graphs — only
        // touched partitions rewritten). The post-drain probe must rank
        // the full streamed corpus exactly like brute force: appended-
        // while-streaming nodes are first-class graph citizens. Float
        // values ride the log as shortest-round-trip decimal strings
        // (string→float is exact both ways), so scores match the batch
        // family bit-for-bit.
        val emb = Tables.embeddings(s, dir)
        val qv = emb.filter(col("vec_id") === 0)
          .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
        val root = Files.createTempDirectory("graft_stream_hnsw").toString
        val cfg = TopicConfig(root, "embh")
        val n = PolarLog.produce(
          emb.filter(col("vec_id") =!= 0).select(
            col("vec_id").cast("string").as("partitionKey"),
            timestamp_micros(col("vec_id")).as("timestamp"),
            concat_ws(",", col("embedding")).cast("binary").as("value")),
          cfg, orderBy = Seq(col("timestamp"), col("value"))).recordsWritten
        val path = s"$root/hnsw_idx"
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(root), s.sparkContext.hadoopConfiguration)
        val q = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 4, 1))).toDF()
          .select(col("partitionKey").cast("long").as("vec_id"),
            split(col("value").cast("string"), ",")
              .cast("array<float>").as("embedding"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            if (!b.isEmpty) {
              if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
                graft.operators.Similarity.hnswIndexWrite(
                  b, "embedding", "vec_id", path, shards = 8)
              else
                graft.operators.Similarity.hnswIndexAppend(
                  b, "embedding", "vec_id", path, shards = 8)
            }
          }
          .start()
        q.awaitTermination(300000)
        graft.operators.Similarity.hnswIndexProbe(s, path, qv, 10)
      },
      Some("""
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0)
        SELECT vec_id AS id,
               round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
                     (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
                      sqrt(list_dot_product(qv, qv))), 6) AS sim
        FROM embeddings, q WHERE vec_id <> 0
        ORDER BY sim DESC, id LIMIT 10""")),

    QueryDef(
      "stream_ivf",
      (s, dir) => withStatePartitions(s, 4) {
        // IVF index maintenance ON the stream: vectors arrive through the
        // topic (quantized to the 2^-20 BIGINT grid for the trip — long →
        // text → long is exact), each is assigned to its nearest seed
        // centroid by the codegen'd integer-L2 kernel (a per-row
        // projection, NO shuffle), and the per-list registry (count +
        // Σdist) is a k-row streaming aggregate in complete mode — the
        // bounded state a 100 TB IVF index keeps per inverted list as
        // vectors stream in. Pacing forces the registry to merge across
        // micro-batches; the oracle replays the assignment in batch.
        val emb = Tables.embeddings(s, dir)
        def quantize(c: org.apache.spark.sql.Column) =
          transform(c, x => floor(x.cast("double") * lit(1048576d)).cast("long"))
        val seeds = emb.orderBy(col("vec_id")).limit(8)
          .select(quantize(col("embedding")).as("qv"))
          .collect().zipWithIndex
          .map { case (r, i) => i -> r.getSeq[Long](0).toSeq }
        val root = Files.createTempDirectory("graft_stream_ivf").toString
        val cfg = TopicConfig(root, "emb")
        val n = PolarLog.produce(
          emb.select(
            col("vec_id").cast("string").as("partitionKey"),
            timestamp_micros(col("vec_id")).as("timestamp"),
            concat_ws(",", quantize(col("embedding"))).cast("binary").as("value")),
          cfg, orderBy = Seq(col("timestamp"), col("value"))).recordsWritten
        val scored = seeds.map { case (cl, c) =>
          struct(
            graft.functions.GraftFunctions.vec_l2sq_long(
              col("qv"), typedLit(c)).as("d"),
            lit(cl).as("cl"))
        }
        val q = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF()
          .select(split(col("value").cast("string"), ",")
            .cast("array<long>").as("qv"))
          .withColumn("best", array_min(array(scored: _*)))
          .groupBy(col("best.cl").as("cluster"))
          .agg(count(lit(1)).as("n"), sum(col("best.d")).as("sum_dist"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("complete")
          .format("memory").queryName("gate_stream_ivf").start()
        q.awaitTermination(300000)
        s.table("gate_stream_ivf")
          .select(col("cluster"), col("n"), col("sum_dist"))
      },
      Some("""
        WITH pts AS (
          SELECT vec_id AS id, i - 1 AS pos,
                 CAST(floor(v[i] * 1048576) AS BIGINT) AS q
          FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
               (SELECT unnest(generate_series(1, 64)) AS i) t),
        init AS (
          SELECT row_number() OVER (ORDER BY id) - 1 AS cl, id
          FROM (SELECT DISTINCT id FROM pts ORDER BY id LIMIT 8)),
        c0 AS (SELECT init.cl, p.pos, p.q AS c FROM pts p JOIN init ON p.id = init.id),
        d1 AS (SELECT p.id, c.cl, SUM((p.q - c.c) * (p.q - c.c)) AS dist
               FROM pts p JOIN c0 c ON p.pos = c.pos GROUP BY p.id, c.cl),
        a1 AS (SELECT id, cl, dist FROM (
                 SELECT id, cl, dist,
                        row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn
                 FROM d1) WHERE rn = 1)
        SELECT cl AS cluster, COUNT(*) AS n, CAST(SUM(dist) AS BIGINT) AS sum_dist
        FROM a1 GROUP BY cl""")),

    QueryDef(
      "stream_anomaly",
      (s, dir) => withStatePartitions(s, 4) {
        // ONLINE per-key anomaly flags on the stream: each event judged
        // against the exact integer running (n, Σx, Σx²) of everything
        // before it — O(1) state per key, pacing forces the state to carry
        // across micro-batches. The oracle replays the same prefix test
        // with window sums over the raw table.
        val (cfg, n) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_anom").toString
        val flags = graft.streaming.StreamAnalytics.anomalyStream(
          PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF(),
          measure = get_json_object(col("value").cast("string"), "$.k").cast("long"))
        val q = flags.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_anomaly").start()
        q.awaitTermination(300000)
        s.table("gate_stream_anomaly")
          .select(col("partitionKey"), col("x"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
            col("n_prev"))
      },
      Some("""
        WITH e AS (
          SELECT CAST(user_id AS VARCHAR) AS partitionKey,
                 CAST(ts AS TIMESTAMP) AS tsv, props,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS x
          FROM events),
        w AS (SELECT partitionKey, tsv, x,
                     COUNT(*) OVER win AS n,
                     COALESCE(SUM(x) OVER win, 0) AS s,
                     COALESCE(SUM(x * x) OVER win, 0) AS q
              FROM e
              WINDOW win AS (PARTITION BY partitionKey ORDER BY tsv, props
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT partitionKey, x,
               strftime(tsv, '%Y-%m-%d %H:%M:%S.%f') AS ts,
               n AS n_prev
        FROM w
        WHERE n >= 8 AND (n * x - s) * (n * x - s) > 9 * (n * q - s * s)""")),

    QueryDef(
      "stream_join",
      (s, dir) => withStatePartitions(s, 4) {
        // stream-stream interval join: "trigger" events (k<20) matched to
        // "outcome" events (k>=80) of the same user within 30 minutes —
        // two watermarked streams over the same topic, state keyed by
        // partitionKey, matches emitted eagerly (inner join), watermark
        // bounding join state to the 30-minute band. The oracle replays
        // the identical interval join in batch over the raw table.
        // INVARIANT: completeness vs the batch oracle relies on the
        // default allAvailable read limit delivering the whole log as ONE
        // micro-batch — with no pacing option set, both sides see all
        // events before any watermark advances. If maxRecordsPerTrigger/
        // maxBytesPerTrigger is ever added here, the 2h watermark plus
        // multi-batch replay could evict join state and drop matches;
        // either keep it unpaced or raise the watermark above the full
        // event-time span of the topic.
        val (cfg, _) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_stream_j").toString
        def side(): org.apache.spark.sql.DataFrame =
          PolarStream.read(s, cfg, startingOffsets = "earliest")
            .select(col("partitionKey"), col("timestamp"),
              get_json_object(col("value").cast("string"), "$.k").cast("int").as("k"))
        val a = side().filter(col("k") < 20)
          .select(col("partitionKey"), col("timestamp").as("ts_a"))
          .withWatermark("ts_a", "2 hours")
        val b = side().filter(col("k") >= 80)
          .select(col("partitionKey").as("pk_b"), col("timestamp").as("ts_b"))
          .withWatermark("ts_b", "2 hours")
        val q = a.join(b,
            col("partitionKey") === col("pk_b") &&
              col("ts_b") > col("ts_a") &&
              col("ts_b") <= col("ts_a") + expr("INTERVAL 30 MINUTES"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_join").start()
        q.awaitTermination(300000)
        s.table("gate_stream_join")
          .groupBy(col("partitionKey")).agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(a.user_id AS VARCHAR) AS partitionKey, COUNT(*) AS n
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 30 MINUTE
        WHERE CAST(a.props->>'$.k' AS INTEGER) < 20
          AND CAST(b.props->>'$.k' AS INTEGER) >= 80
        GROUP BY a.user_id""")),

    QueryDef(
      "stream_curate",
      (s, dir) => withStatePartitions(s, 4) {
        // the curation pipeline RUNNING ON THE STREAM: documents produced
        // into a topic TWICE (at-least-once redelivery), streamed back in
        // two paced micro-batches, then quality gate -> language filter ->
        // cross-batch exact dedup — the same pure column expressions as
        // the batch pipeline_curate, proving the text operators are
        // streaming-safe (stateless projections) and the dedup state
        // carries batch 1's keys into batch 2
        import graft.operators.TextAnalysis
        val root = Files.createTempDirectory("graft_stream_c").toString
        val cfg = TopicConfig(root, "docs")
        // +1 day: a doc_id-0 record at epoch 0 would equal the INITIAL
        // watermark and be discarded as late by the stateful dedup
        val records = Tables.documents(s, dir).select(
          col("doc_id").cast("string").as("partitionKey"),
          timestamp_seconds(col("doc_id") + 86400).as("timestamp"),
          col("text").as("value"))
        PolarLog.produce(records, cfg)
        PolarLog.produce(records, cfg) // redelivery
        val n = records.count()
        // dedup keyed on text ALONE (the curation semantics: one survivor
        // per distinct content, exactly the oracle's GROUP BY text) — not
        // dedupStream's (keys, timestamp) exactly-once-delivery shape
        val curated = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n, 1)))
          .select(col("timestamp"), col("value").cast("string").as("text"))
          .filter(TextAnalysis.qualityScore(col("text")) >= 0.5 &&
            TextAnalysis.langId(col("text")) === "en")
          .withWatermark("timestamp", "60 days")
          .dropDuplicates("text")
        val q = curated.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_curate").start()
        q.awaitTermination(300000)
        s.table("gate_stream_curate")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("n_chars"))
      },
      Some(s"""
        WITH scored AS (
          SELECT text,
                 round(
                   least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.5 +
                   least(CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|a|is|it|for|on)\\b')) AS DOUBLE)
                         / (CAST(len(regexp_extract_all(text, '[^ ]+')) AS DOUBLE) + 1.0) * 5.0, 1.0) * 0.3 +
                   (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                          / (CAST(length(text) AS DOUBLE) + 1.0)) * 0.2, 6) AS quality,
                 len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|that|it)\\b')) AS s_en,
                 len(regexp_extract_all(lower(text), '\\b(el|la|los|las|de|que|y|es)\\b')) AS s_es,
                 len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist|nicht|ein)\\b')) AS s_de,
                 len(regexp_extract_all(lower(text), '\\b(le|les|des|et|est|une|dans)\\b')) AS s_fr,
                 len(regexp_extract_all(lower(text), '[\\x{4e00}-\\x{9fff}]')) AS s_zh
          FROM documents),
        deduped AS (
          SELECT text FROM scored
          WHERE quality >= 0.5 AND s_en > 0
            AND s_en = greatest(s_en, s_es, s_de, s_fr, s_zh)
          GROUP BY text)
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars
        FROM deduped""")),

    QueryDef(
      "stream_pack",
      (s, dir) => withStatePartitions(s, 4) {
        // sequence packing ON THE STREAM: documents produced into a topic,
        // streamed back, and packed into 2048-token context windows by the
        // stateful packer — the per-shard token cursor lives in
        // flatMapGroupsWithState state (O(shards) state, batch-boundary
        // safe). One AvailableNow batch ⇒ output equals the batch packer,
        // so pipeline_pack's oracle verifies the streaming machinery.
        import graft.operators.TextAnalysis
        import graft.streaming.StreamAnalytics
        val root = Files.createTempDirectory("graft_stream_pk").toString
        val cfg = TopicConfig(root, "docs")
        val records = Tables.documents(s, dir).select(
          col("doc_id").cast("string").as("partitionKey"),
          timestamp_seconds(col("doc_id") + 86400).as("timestamp"),
          col("text").as("value"))
        PolarLog.produce(records, cfg)
        val docs = PolarStream.read(s, cfg, startingOffsets = "earliest")
          .select(col("partitionKey").cast("long").as("doc_id"),
            TextAnalysis.subwordCount(col("value").cast("string")).as("nt"))
        val q = StreamAnalytics.packStream(docs, 2048, shards = 8)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_pack").start()
        q.awaitTermination(300000)
        s.table("gate_stream_pack")
          .groupBy(col("shard"), col("window").as("win"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '[^ ]+'))
                      + floor(length(text) / 16) AS BIGINT) AS nt,
                 ${OracleSql.md5Hash60("doc_id")} % 8 AS shard,
                 ${OracleSql.md5Hash60("doc_id")} AS h
          FROM documents),
        c AS (
          SELECT doc_id, nt, shard,
                 SUM(nt) OVER (PARTITION BY shard ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt AS cum
          FROM t)
        SELECT shard, CAST(floor(cum / 2048) AS BIGINT) AS win,
               COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens
        FROM c GROUP BY shard, win""")),

    QueryDef(
      "stream_winnow",
      (s, dir) => withStatePartitions(s, 4) {
        // winnowing fingerprint NOVELTY on the stream: documents stream
        // from a topic in paced micro-batches, each row computes its
        // fingerprint set with the per-row winnowFpSet expression (the
        // stream-safe formulation — no per-doc window sort), and
        // cross-batch dropDuplicates state emits each fingerprint exactly
        // ONCE, at first sight. The novel-fp set is winner-independent
        // (whichever document arrives first, the fp value is the same),
        // so the output is deterministic and the oracle replays it as
        // the batch DISTINCT over the same sample.
        import graft.operators.TextAnalysis
        val root = Files.createTempDirectory("graft_stream_w").toString
        val cfg = TopicConfig(root, "docs")
        val records = Tables.documents(s, dir)
          .filter(col("doc_id") % 5 === 0)
          .select(
            col("doc_id").cast("string").as("partitionKey"),
            timestamp_seconds(col("doc_id") + 86400).as("timestamp"),
            col("text").as("value"))
        PolarLog.produce(records, cfg)
        val n = records.count()
        val novel = PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1)))
          .select(col("timestamp"),
            explode(TextAnalysis.winnowFpSet(
              col("value").cast("string"), k = 8, w = 4)).as("fp"))
          .withWatermark("timestamp", "60 days")
          .dropDuplicates("fp")
        val q = novel.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_winnow").start()
        q.awaitTermination(300000)
        s.table("gate_stream_winnow").select(col("fp"))
      },
      Some(s"""
        WITH ${OracleSql.winnowCtes("doc_id % 5 = 0")}
        SELECT DISTINCT ${OracleSql.hex15ToInt("substr(mn, 1, 15)")} AS fp
        FROM u""")),

    QueryDef(
      "stream_domain_cap",
      (s, dir) => withStatePartitions(s, 4) {
        // per-domain quota ADMISSION at the log (ingest-time twin of
        // pipeline_domain_cap): each domain admits its first 10 documents
        // in event-time order, O(1) counter state spanning the paced
        // micro-batches. Timestamps are strictly increasing per domain and
        // produce orders offsets by timestamp, so the admitted set is
        // exactly the lowest-10 doc_ids per domain — the oracle's
        // row_number cap.
        val root = Files.createTempDirectory("graft_stream_q").toString
        val cfg = TopicConfig(root, "docs")
        val records = Tables.documents(s, dir).select(
          (col("doc_id") % 20).cast("string").as("partitionKey"),
          timestamp_seconds(col("doc_id") + 86400).as("timestamp"),
          col("doc_id").cast("string").as("value"))
        PolarLog.produce(records, cfg)
        val n = records.count()
        val admitted = graft.streaming.StreamAnalytics.quotaAdmit(
          PolarStream.read(s, cfg, startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1))).toDF(),
          cap = 10)
        val q = admitted.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_domain_cap").start()
        q.awaitTermination(300000)
        s.table("gate_stream_domain_cap").select(
          col("partitionKey").cast("long").as("domain"),
          col("value").cast("long").as("doc_id"),
          col("seq"))
      },
      Some("""
        WITH r AS (
          SELECT doc_id % 20 AS domain, doc_id,
                 row_number() OVER (PARTITION BY doc_id % 20
                                    ORDER BY doc_id) AS seq
          FROM documents)
        SELECT domain, doc_id, CAST(seq AS BIGINT) AS seq
        FROM r WHERE seq <= 10""")),

    QueryDef(
      "stream_backfill_union",
      (s, dir) => {
        // the LAMBDA-ARCHITECTURE KILL: one log serves both legs. Batch
        // backfill reads history (ts < cut) through the DSv2 BATCH scan —
        // the pushed timestamp window prunes segments by registry ts
        // stats; the live tail STREAMS from the same topic with
        // startingTimestamp=cut (segment-granular seek; the ts >= cut
        // filter is the contract, the seek is the optimization). Their
        // union must equal the raw table exactly — no seam, no loss, no
        // duplication at the cut.
        val (cfg, _) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_backfill").toString
        val cutTs = lit("2024-01-20 00:00:00").cast("timestamp")
        val cutMicros = java.time.Instant.parse("2024-01-20T00:00:00Z")
          .getEpochSecond * 1000L // startingTimestamp epoch-millis form
        val backfill = s.read.format("polar")
          .option("root", cfg.root).option("topic", cfg.topic).load()
          .filter(col("timestamp") < cutTs)
        val q = s.readStream.format("polar")
          .option("root", cfg.root).option("topic", cfg.topic)
          .option("startingTimestamp", cutMicros.toString)
          .load()
          .filter(col("timestamp") >= cutTs)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_backfill_tail").start()
        q.awaitTermination(300000)
        val tail = s.table("gate_backfill_tail")
        backfill.select(lit("backfill").as("segment"),
            col("timestamp"), col("partitionKey"))
          .unionAll(tail.select(lit("tail").as("segment"),
            col("timestamp"), col("partitionKey")))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("partitionKey")).as("n_keys"),
            date_format(min(col("timestamp")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("first_ts"),
            date_format(max(col("timestamp")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("last_ts"))
      },
      Some("""
        WITH e AS (
          SELECT CAST(ts AS TIMESTAMP) AS tsv, CAST(user_id AS VARCHAR) AS pk,
                 CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20 00:00:00'
                      THEN 'backfill' ELSE 'tail' END AS segment
          FROM events)
        SELECT segment, COUNT(*) AS n, COUNT(DISTINCT pk) AS n_keys,
               strftime(MIN(tsv), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
               strftime(MAX(tsv), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
        FROM e GROUP BY segment""")),

    QueryDef(
      "stream_ts_seek",
      (s, dir) => {
        // event-time seek on the stream: startingTimestamp resolves each
        // partition's initial offset to the first segment whose registry
        // tsMax can hold ts >= T. Two time-disjoint produces → the stream
        // starts at the second; the oracle replays the same cut over the
        // raw table.
        val root = Files.createTempDirectory("graft_stream_ts").toString
        val cfg = TopicConfig(root, "tsev")
        def half(lo: Long, hi: Long, baseSec: Long) = Tables.events(s, dir)
          .filter(col("event_id") >= lo && col("event_id") < hi)
          .select(col("user_id").cast("string").as("partitionKey"),
            timestamp_seconds(lit(baseSec) + col("event_id")).as("timestamp"),
            col("props").as("value"))
        val n = Tables.events(s, dir).count()
        PolarLog.produce(half(0, n / 2, 1000000L), cfg,
          orderBy = Seq(col("timestamp"), col("value")))
        PolarLog.produce(half(n / 2, n, 900000000L), cfg,
          orderBy = Seq(col("timestamp"), col("value")))
        val stream = s.readStream.format("polar")
          .option("root", cfg.root).option("topic", cfg.topic)
          .option("startingTimestamp", (800000000L * 1000L).toString)
          .load()
        val q = stream.writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_ts").start()
        q.awaitTermination(300000)
        s.table("gate_stream_ts")
          .agg(count(lit(1)).as("n_records"),
            countDistinct(col("partitionKey")).as("n_keys"),
            unix_micros(min(col("timestamp"))).as("min_ts_us"))
      },
      Some("""
        SELECT COUNT(*) AS n_records,
               COUNT(DISTINCT CAST(user_id AS VARCHAR)) AS n_keys,
               CAST((900000000 + MIN(event_id)) * 1000000 AS BIGINT) AS min_ts_us
        FROM events
        WHERE event_id >= (SELECT CAST(floor(COUNT(*) / 2) AS BIGINT) FROM events)""")),

    QueryDef(
      "stream_ts_seek_exact",
      (s, dir) => {
        // RECORD-EXACT startingTimestamp (Kafka offsetsForTimes parity):
        // the cut falls MID-FILE in every partition (the shared topic is
        // one produce, per-partition ts-ordered), so a file-granular seek
        // would deliver pre-T records; the record-exact seek must deliver
        // none WITHOUT a compensating filter. Zero pre-T rows is asserted
        // in-gate; the oracle replays the cut over the raw table.
        val (cfg, _) = sharedTopic(s, dir)
        val root = Files.createTempDirectory("graft_ts_exact").toString
        val cutIso = "2024-01-15T00:00:00Z"
        val q = s.readStream.format("polar")
          .option("root", cfg.root).option("topic", cfg.topic)
          .option("startingTimestamp", cutIso)
          .load()
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_ts_exact").start()
        q.awaitTermination(300000)
        val drained = s.table("gate_ts_exact")
        val preT = drained.filter(
          col("timestamp") < lit("2024-01-15 00:00:00").cast("timestamp")).count()
        require(preT == 0, s"record-exact seek delivered $preT pre-cut records")
        drained.agg(count(lit(1)).as("n"),
          countDistinct(col("partitionKey")).as("n_keys"),
          date_format(min(col("timestamp")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("first_ts"))
      },
      Some("""
        SELECT COUNT(*) AS n,
               COUNT(DISTINCT CAST(user_id AS VARCHAR)) AS n_keys,
               strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
        FROM events
        WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'""")),

    QueryDef(
      "stream_pattern_discovery",
      (s, dir) => {
        // LIVE pattern subscription (Kafka subscribePattern parity, the
        // reference's live topic registration): a `pdisc\d` stream starts
        // on topic pdisc0; pdisc1 is CREATED MID-STREAM and must join the
        // subscription automatically (admitted from offset 0); pdisc2 is
        // created after the stream stops and must be picked up by the
        // CHECKPOINT-RESUMED query (round-trip: nothing re-delivered,
        // nothing lost). Output: per-topic delivery counts over all three
        // phases; the oracle replays the 3-way split from the raw table.
        val root = Files.createTempDirectory("graft_stream_pd").toString
        def slice(rem: Int) = Tables.events(s, dir)
          .filter(pmod(col("event_id"), lit(3)) === rem)
          .select(col("user_id").cast("string").as("partitionKey"),
            col("ts").as("timestamp"), col("props").as("value"))
        PolarLog.produce(slice(0), TopicConfig(root, "pdisc0"))
        val stream = PolarStream.readPattern(s, root, "pdisc\\d",
          startingOffsets = "earliest")
        val q = stream.writeStream
          .trigger(Trigger.ProcessingTime("50 milliseconds"))
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_pdisc_live").start()
        q.processAllAvailable()
        // a matching topic born while the query runs: the next trigger's
        // pattern refresh must admit it — no restart, no re-load
        PolarLog.produce(slice(1), TopicConfig(root, "pdisc1"))
        q.processAllAvailable()
        q.stop()
        val live = s.table("gate_pdisc_live")
          .select(col("topic"), col("partitionKey")).collect()
        // a topic born between runs: the checkpoint-resumed query discovers
        // it at restart and delivers ONLY its records (offsets round-trip)
        PolarLog.produce(slice(2), TopicConfig(root, "pdisc2"))
        // memory sinks cannot recover a checkpoint — resume via foreachBatch
        val resumed = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
        val q2 = stream.writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.select(col("topic"), col("partitionKey")).collect()
              .foreach(r => resumed.add((r.getString(0), r.getString(1))))
          }.start()
        q2.awaitTermination(300000)
        import scala.jdk.CollectionConverters._
        require(resumed.asScala.forall(_._1 == "pdisc2"),
          "checkpoint resume must not re-deliver discovered topics")
        import s.implicits._
        (live.toSeq.map(r => (r.getString(0), r.getString(1))) ++
            resumed.asScala)
          .toDF("topic", "partitionKey")
          .groupBy(col("topic"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("partitionKey")).as("n_keys"))
      },
      Some("""
        SELECT 'pdisc' || CAST(event_id % 3 AS VARCHAR) AS topic,
               COUNT(*) AS n,
               COUNT(DISTINCT CAST(user_id AS VARCHAR)) AS n_keys
        FROM events GROUP BY 1""")),

    QueryDef(
      "stream_multi_topic",
      (s, dir) => {
        // one streaming query subscribed to TWO topics (the reference's
        // consumers register for topic lists, internal/types/models.go:34-39):
        // events split by user parity into two logs under one root, consumed
        // through `option("topics", "evens,odds")` with (topic, partition)
        // offsets, paced so the trigger windows interleave both topics'
        // partitions; the aggregate proves per-topic attribution and
        // no loss/duplication across topics and batch boundaries
        val root = Files.createTempDirectory("graft_stream_mt").toString
        val ev = Tables.events(s, dir).select(
          col("user_id").cast("string").as("partitionKey"),
          col("ts").as("timestamp"),
          col("props").as("value"),
          (col("user_id") % 2 === 0).as("even"))
        val evens = TopicConfig(root, "evens")
        val odds = TopicConfig(root, "odds")
        val n =
          PolarLog.produce(ev.filter(col("even")).drop("even"), evens,
            orderBy = Seq(col("timestamp"), col("value"))).recordsWritten +
          PolarLog.produce(ev.filter(!col("even")).drop("even"), odds,
            orderBy = Seq(col("timestamp"), col("value"))).recordsWritten
        val q = PolarStream.readTopics(s, Seq(evens, odds),
            startingOffsets = "earliest",
            maxRecordsPerTrigger = Some(math.max(n / 5, 1)))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName("gate_stream_multi").start()
        q.awaitTermination(300000)
        s.table("gate_stream_multi")
          .groupBy(col("topic"), col("partitionKey"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("offset"), col("part")).as("n_unique"))
      },
      Some("""
        SELECT CASE WHEN user_id % 2 = 0 THEN 'evens' ELSE 'odds' END AS topic,
               CAST(user_id AS VARCHAR) AS partitionKey,
               COUNT(*) AS n, COUNT(*) AS n_unique
        FROM events GROUP BY 1, 2""")))
}
