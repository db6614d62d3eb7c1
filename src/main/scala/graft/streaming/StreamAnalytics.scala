package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
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
}
