package graft.tools
import graft.operators.Bucketing
import org.apache.spark.sql.functions._
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("bucket_probe_wh").toString
    val spark = graft.GraftSession.builder()
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    Bucketing.writeBucketed(graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity")), "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")), "ord_b", "l_orderkey", 8)
    val j = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey")
    val plan = j.queryExecution.executedPlan.toString
    println("EXCHANGES " + "Exchange".r.findAllIn(plan).length)
    println("SMJ " + plan.contains("SortMergeJoin"))
    println("ROWS " + j.count())
    // probe: mismatched bucket counts -> Spark must still be correct (may shuffle one side)
    Bucketing.writeBucketed(graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")), "ord_b4", "l_orderkey", 4)
    val j2 = Bucketing.bucketedJoin(spark, "li_b", "ord_b4", "l_orderkey")
    println("MISMATCH rows=" + j2.count() + " exchanges=" +
      "Exchange".r.findAllIn(j2.queryExecution.executedPlan.toString).length)
    spark.stop()
  }
}
