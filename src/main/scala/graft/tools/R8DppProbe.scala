package graft.tools

import graft.GraftSession
import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.functions._

/** Probe: does Spark plan a DynamicPruning subquery against the polar
  * scan's SupportsRuntimeFiltering for a join keyed on partitionKey/part?
  * Findings recorded in PLANS.md (round 8). NOT part of the shipped
  * library — measurement harness only. */
object R8DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("dpp_probe").toString
    val cfg = TopicConfig(root, "events")
    PolarLog.produce(graft.Tables.events(spark, "/root/testdata/sf0.01").select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value")), cfg)

    val fact = spark.read.format("polar")
      .option("root", cfg.root).option("topic", cfg.topic).load()
    // selective dim: 2 keys out of 150
    val dim = graft.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("user_id").cast("string").as("partitionKey")).distinct()
      .filter(col("partitionKey").isin("1", "2"))

    for ((name, joined) <- Seq(
      "join-on-partitionKey" -> fact.join(dim, Seq("partitionKey")),
      "join-on-part" -> fact.join(
        dim.withColumn("part", (col("partitionKey").cast("int") % 12)), Seq("part")))) {
      println(s"PROBE $name optimized:")
      val plan = joined.queryExecution.optimizedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("dynamicpruning") || l.contains("RuntimeFilter") ||
        l.contains("Scan")).mkString("\n"))
      val exec = joined.queryExecution.executedPlan.toString
      println(s"PROBE $name executed has dynamicpruning: " +
        exec.contains("dynamicpruning"))
      println(s"PROBE $name rows: " + joined.count())
    }
    spark.stop()
  }
}
