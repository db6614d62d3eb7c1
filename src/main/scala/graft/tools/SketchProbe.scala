package graft.tools
import graft.operators.{Dedup, TextAnalysis, Similarity}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = docs.select(simhash64(TextAnalysis.tokens(col("text"))).as("sh"),
      rolling_fingerprint(col("text")).as("fp"),
      hyperplane_lsh(typedLit(Seq(1.0f, 2.0f, 3.0f)), 8, 42).as("b"))
    plan.explain("codegen")
    plan.show(3)
    // probe: simhash on wrong type
    try { docs.select(simhash64(col("doc_id"))).collect();
      println("PROBE FAIL: long accepted") }
    catch { case e: Exception => println("PROBE OK: " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
