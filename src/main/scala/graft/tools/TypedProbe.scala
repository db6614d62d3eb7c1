package graft.tools
import graft.log._
import org.apache.spark.sql.functions._
object TypedProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val root = java.nio.file.Files.createTempDirectory("typed_probe").toString
    val cfg = TopicConfig(root, "t")
    PolarLog.produce(graft.Tables.events(spark, "/root/testdata/sf0.001").limit(100)
      .select(col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value")), cfg)
    val ds: org.apache.spark.sql.Dataset[PolarRecord] = PolarLog.consumeTyped(spark, cfg)
    val maxOffsets = ds.groupByKey(_.part)(org.apache.spark.sql.Encoders.scalaInt)
      .mapValues(_.offset)(org.apache.spark.sql.Encoders.scalaLong)
      .reduceGroups((a: Long, b: Long) => math.max(a, b)).collect().sortBy(_._1)
    println("TYPED " + maxOffsets.mkString(","))
    println("TYPED nullkeys " + ds.filter((r: PolarRecord) => r.partitionKey.isEmpty).count())
    // probe: sorted_jaccard type error via SQL registry
    try { spark.sql("SELECT sorted_jaccard(array(1,2), array(2,3))").collect()
      println("PROBE FAIL") }
    catch { case e: Exception => println("PROBE OK " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
