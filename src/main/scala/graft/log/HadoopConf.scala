package graft.log

import org.apache.hadoop.conf.Configuration

/**
 * One parsed Hadoop `Configuration` per JVM. Constructing `new
 * Configuration()` re-parses every `*-default.xml`/`*-site.xml` on the
 * classpath (seconds of cumulative XML work under Spark's jar list, plus
 * contention on Configuration's static resource registry) — metadata-plane
 * code paths (registry reads, CAS commits, retention sweeps) were paying it
 * per call. `shared` is read-only by convention; call sites that SET keys
 * take [[fresh]], a property copy that skips the XML re-parse.
 */
object HadoopConf {
  lazy val shared: Configuration = new Configuration()

  /** Mutable copy (copies loaded properties; no resource re-parse). */
  def fresh(): Configuration = new Configuration(shared)
}
