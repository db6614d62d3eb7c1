package graft.tools
import graft.log._
import org.apache.spark.sql.functions._
object DownProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val root = java.nio.file.Files.createTempDirectory("down_probe").toString
    val cfg = TopicConfig(root, "t", clusterSize = 6)
    PolarLog.produce(graft.Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value")), cfg)
    val before = PolarLog.tails(cfg).values.sum
    val res = TopicOps.repartitionTopic(spark, cfg, "t_small", newClusterSize = 3)
    println(s"DOWN moved=${res.recordsMoved} before=$before after=" +
      PolarLog.tails(res.newCfg).values.sum +
      " parts=" + PolarLog.consume(spark, res.newCfg).select("part").distinct().count())
    // probe: repartition to an invalid ring size
    try { TopicOps.repartitionTopic(spark, cfg, "t_bad", 5); println("PROBE FAIL") }
    catch { case e: Exception => println("PROBE OK " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
