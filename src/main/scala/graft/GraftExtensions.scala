package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Config-injectable extensions entry point: any Spark deployment turns on
 * the engine's SQL function surface (murmur3_h1, polar_partition, the
 * sketch/shingle kernels, hll60, …) with
 *
 * {{{
 *   spark.sql.extensions=graft.GraftExtensions
 * }}}
 *
 * — no code path through [[GraftSession]] needed. This is the standard
 * library-packaging hook (the same mechanism Delta/Iceberg use), so a
 * cluster-wide spark-defaults.conf can expose the engine to every session,
 * including pure-SQL ones (combine with
 * `spark.sql.catalog.polar=graft.sources.PolarCatalog` for topics-as-tables).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.install(ext)
    graft.sources.PolarTvf.install(ext)
    graft.plans.PolarMergeRewrite.install(ext)
  }
}
