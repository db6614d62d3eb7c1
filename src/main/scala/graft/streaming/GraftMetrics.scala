package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/**
 * Engine metrics (SURVEY §2 A34): the counters the reference exports to
 * Prometheus (messages received/served, batch sizes, active queries),
 * re-expressed over Spark's StreamingQueryListener. Attach once per session;
 * scrape via [[snapshot]] (a metrics registry bridge would export the same
 * map).
 */
class GraftMetrics extends StreamingQueryListener {
  private val counters = new ConcurrentHashMap[String, LongAdder]()
  private def add(k: String, v: Long): Unit =
    counters.computeIfAbsent(k, _ => new LongAdder).add(v)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    add("queries_started", 1)

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    add("batches_completed", 1)
    add("records_consumed", e.progress.numInputRows)
    e.progress.sources.foreach { s =>
      if (s.description != null && s.description.contains("PolarScan"))
        add("polar_records_consumed", s.numInputRows)
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    add("queries_terminated", 1)

  def snapshot: Map[String, Long] = {
    val out = scala.collection.mutable.Map.empty[String, Long]
    counters.forEach((k, v) => out += k -> v.sum())
    out.toMap
  }
}

object GraftMetrics {
  /** Attach a fresh metrics listener to the session and return it. */
  def attach(spark: SparkSession): GraftMetrics = {
    val m = new GraftMetrics
    spark.streams.addListener(m)
    m
  }
}
