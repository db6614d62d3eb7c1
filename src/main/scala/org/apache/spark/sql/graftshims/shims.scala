package org.apache.spark.sql.graftshims

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/**
 * Minimal bridge to two `private[sql]` seams that every Spark extension
 * library needs: wrapping a Catalyst Expression as a Column, and registering
 * native (non-UDF, codegen-capable) functions on an already-built session.
 * Same approach as spark-packages (e.g. sedona, delta) use; no Spark
 * internals are modified.
 */
object GraftShims {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def functionExists(spark: SparkSession, name: String): Boolean = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.functionExists(FunctionIdentifier(name))
  }

  def registerFunction(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: FunctionBuilder): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
  }

  def tableFunctionExists(spark: SparkSession, name: String): Boolean = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.tableFunctionRegistry
      .functionExists(FunctionIdentifier(name))
  }

  /** Table-valued function registration (FROM clause) on a built session —
    * the seam `injectTableFunction` uses at extension time. */
  def registerTableFunction(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.tableFunctionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
  }

  /** The analyzed plan of a frame — embeddable into another query during
    * analysis (what a TVF builder must return). */
  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** A DataFrame over an already-materialized internal RDD, carrying the
    * origin frame's schema, partitioning, ordering and constraints — the
    * exact construction `Dataset.localCheckpoint` performs
    * (`LogicalRDD.fromDataset`), exposed so a caller can materialize the
    * RDD itself (e.g. fusing a row count into the checkpointing job)
    * instead of paying a separate count pass over the blocks. */
  def checkpointedFrom(
      origin: org.apache.spark.sql.DataFrame,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow])
      : org.apache.spark.sql.DataFrame = {
    val classic = origin.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    org.apache.spark.sql.classic.Dataset.ofRows(
      classic.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD
        .fromDataset(rdd, classic, isStreaming = false))
  }

  /** Drain the async listener bus: block until every queued event has been
    * delivered (or the timeout passes — best-effort, never throws). The
    * profiling tools read listener-fed counters right after an action;
    * a fixed sleep undercounts under load and lets one rep's async sweep
    * events bleed into the next rep's counters. */
  def waitListenerBusEmpty(spark: SparkSession, timeoutMillis: Long): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: Throwable => () }

  /** A DataFrame over an already-analyzed logical plan — the inverse seam:
    * a rewritten SQL command (MERGE INTO → log merge) hands its resolved
    * source subtree back to the DataFrame API at execution time. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
