package graft.tools
import graft.SparkEntry
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm
      val t0 = System.nanoTime(); fn(spark, dir).count()
      val t1 = System.nanoTime(); fn(spark, dir).count()
      val t2 = System.nanoTime()
      println(f"TIMING $name cold=${(t1-t0)/1e9}%.2f warm=${(t2-t1)/1e9}%.2f")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
