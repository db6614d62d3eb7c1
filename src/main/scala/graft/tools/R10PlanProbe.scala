package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Round-10 plan audit: the routed write's exchange count, the assign
  * scan's plan shape, and the merge fast path's job shape. */
object R10PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("r10probe").toString

    // --- routed write: expect exactly ONE shuffle (cluster by topic,part)
    // and ONE local sort feeding the write — same cost as a single-topic
    // produce, regardless of topic count
    val routed = graft.Tables.events(spark, sfDir)
      .select(concat(lit("t"), (col("event_id") % 3).cast("string")).as("topic"),
        col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value"))
    // capture the physical plan via the QueryExecutionListener
    @volatile var writePlan: String = ""
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (qe.executedPlan.toString.contains("polar"))
          writePlan = qe.executedPlan.toString
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    routed.write.format("polar").option("root", root).mode("append").save()
    Thread.sleep(1500) // listener delivery is async
    // exact node matches (a plan string under AQE prints initial+final,
    // so counts are per-print; substring hits like SortAggregate excluded)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(writePlan).size
    val sorts = """\*?\(?\d*\)? ?Sort \[""".r.findAllIn(writePlan).size
    println(s"PROBE routed_write exchange_nodes=$exchanges sort_nodes=$sorts (x2: AQE prints initial+final)")
    println(writePlan.linesIterator.take(8).map("PROBE   " + _).mkString("\n"))

    // --- assign scan: planned partitions subset; no residual filter node
    val assigned = spark.read.format("polar")
      .option("root", root).option("assign", """{"t0":[0,3,7]}""").load()
    val plan = assigned.queryExecution.executedPlan.toString
    println(s"PROBE assign_scan plan_head=${plan.linesIterator.take(3).mkString(" | ")}")
    val parts = assigned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get.batch.planInputPartitions().map {
      case p: graft.sources.PolarInputPartition => p.part
    }.sorted
    println(s"PROBE assign_planned_parts=${parts.mkString(",")}")

    // --- merge fast path: all clauses on => the plan is produce-shaped
    // (no join against the compacted view)
    import spark.implicits._
    val chg = Seq(("k1", "v1"), ("k2", "v2")).toDF("partitionKey", "v")
      .selectExpr("partitionKey", "current_timestamp() AS timestamp",
        "CAST(v AS BINARY) AS value")
    writePlan = ""
    graft.log.PolarLog.merge(spark, graft.log.TopicConfig(root, "t0"), chg)
    Thread.sleep(1500) // listener delivery is async
    println(s"PROBE merge_fast_path join_nodes=" +
      "Join".r.findAllIn(writePlan).size)
    spark.stop()
  }
}
