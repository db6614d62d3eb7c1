package graft.tools
import graft.log._
import org.apache.spark.sql.functions._
object FixProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val root = java.nio.file.Files.createTempDirectory("fix_probe").toString
    val key = "spark.sql.parquet.outputTimestampType"
    val before = spark.conf.getOption(key)
    PolarLog.produce(graft.Tables.events(spark, "/root/testdata/sf0.001").limit(50)
      .select(col("user_id").cast("string").as("partitionKey"),
        col("ts").as("timestamp"), col("props").as("value")), TopicConfig(root, "t"))
    val after = spark.conf.getOption(key)
    println(s"CONF before=$before after=$after restored=${before == after}")
    // null-element sorted jaccard via SQL
    val r = spark.sql(
      "SELECT sorted_jaccard(array(CAST(NULL AS STRING),'a','b'), array('a','c')) AS j").head()
    println(s"NULLSAFE j=${r.getDouble(0)}")  // inter {a}=1, union {a,b}+{a,c}=3 -> 0.333...
    spark.stop()
  }
}
