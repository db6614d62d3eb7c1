package graft.tools

import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Captures the physical plan of the DSv2 produce path: the plan must be
  * Exchange(hashpartitioning(part)) + local Sort + AppendData — no Window,
  * no global sort. */
object WritePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(name: String, qe: QueryExecution, d: Long): Unit =
        plans += qe.executedPlan.toString
      override def onFailure(name: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    val root = java.nio.file.Files.createTempDirectory("writeplan").toString
    val cfg = TopicConfig(root, "t")
    val df = spark.range(5000).selectExpr(
      "cast(id % 97 as string) as partitionKey",
      "timestamp_micros(1700000000000000 + id * 1000) as timestamp",
      "cast(concat('v', id) as binary) as value")
    PolarLog.produce(df, cfg)
    // listener delivery is async; poll briefly for the write plan
    val deadline = System.currentTimeMillis() + 10000
    while (!plans.exists(_.contains("AppendData")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    val writePlan = plans.find(_.contains("AppendData")).getOrElse("NO WRITE PLAN CAPTURED")
    println("===== produce physical plan =====")
    println(writePlan)
    // assertions the doc claims: no window, a clustering exchange, and any
    // sort is LOCAL (the second Sort argument, `false`, is the global flag)
    assert(!writePlan.contains("Window"), "produce must not use a window")
    assert(writePlan.contains("hashpartitioning"), "clustering exchange missing")
    assert("Sort \\[[^\\]]*\\], true".r.findFirstIn(writePlan).isEmpty,
      "sort must be local, found a global sort")
    println("PROBE OK: produce plan is exchange + local sort + append, no window")
    spark.stop()
  }
}
