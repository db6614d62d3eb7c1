package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries and oracles are assembled from per-area registries. */
object SparkEntry {

  private def registries: Seq[QueryRegistry] = Seq(
    RelationalQueries,
    PolarLogQueries,
    StreamingQueries,
    PipelineQueries)

  private lazy val defs: Seq[QueryDef] = registries.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.ensureFunctions(spark)
    defs.head.fn(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> withFunctions(d.fn)).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> normalize(sql))).toMap

  private def withFunctions(
      fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (spark, dir) => {
      GraftSession.ensureFunctions(spark)
      fn(spark, dir)
    }

  private def normalize(sql: String): String =
    sql.stripMargin.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
