package graft.sources

import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftshims.GraftShims
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL table-valued functions over the log — the pure-SQL spelling of the
 * lakehouse reads (Delta's `table_changes(...)` shape):
 *
 * {{{
 *   SELECT * FROM polar_changes('/data/polar', 't', 7)        -- (7, head]
 *   SELECT * FROM polar_changes('/data/polar', 't', 7, 9)     -- (7, 9]
 *   SELECT * FROM polar_compacted('/data/polar', 't')         -- KTable view
 *   SELECT * FROM polar_compacted('/data/polar', 't', 9)      -- ... AS OF 9
 * }}}
 *
 * Builders resolve at analysis time on the active session; arguments must
 * be literals (version pins belong in the query text, not in data). The
 * returned plan is the library API's own analyzed plan, so SQL and Scala
 * answers are identical by construction.
 */
object PolarTvf {

  private def strArg(e: Expression, fn: String, what: String): String = {
    require(e.foldable, s"$fn: $what must be a string literal")
    e.eval() match {
      case s: UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a string literal, got $other")
    }
  }

  private def longArg(e: Expression, fn: String, what: String): Long = {
    require(e.foldable, s"$fn: $what must be an integer literal")
    e.eval() match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }
  }

  private def changesBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 || args.length == 4,
      "polar_changes(root, topic, fromVersion[, toVersion])")
    val fn = "polar_changes"
    val cfg = TopicConfig(strArg(args(0), fn, "root"), strArg(args(1), fn, "topic"))
    val to = if (args.length == 4) Some(longArg(args(3), fn, "toVersion")) else None
    GraftShims.analyzedPlan(PolarLog.changesBetween(
      SparkSession.active, cfg, longArg(args(2), fn, "fromVersion"), to))
  }

  private def compactedBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      "polar_compacted(root, topic[, versionAsOf])")
    val fn = "polar_compacted"
    val cfg = TopicConfig(strArg(args(0), fn, "root"), strArg(args(1), fn, "topic"))
    val v = if (args.length == 3) Some(longArg(args(2), fn, "versionAsOf")) else None
    GraftShims.analyzedPlan(PolarLog.consumeCompacted(SparkSession.active, cfg, v))
  }

  private val builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "polar_changes" -> changesBuilder,
    "polar_compacted" -> compactedBuilder)

  /** SparkSessionExtensions hook — wired by [[graft.GraftExtensions]]. */
  def install(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectTableFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name), b))
    }

  /** Idempotent registration on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      if (!GraftShims.tableFunctionExists(spark, name))
        GraftShims.registerTableFunction(spark, name,
          new ExpressionInfo(getClass.getName, name), b)
    }
}
