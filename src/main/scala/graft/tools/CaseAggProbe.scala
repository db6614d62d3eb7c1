package graft.tools

/** One-off: dump q_case_agg at sf0.01 for DuckDB diffing. */
object CaseAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val df = graft.SparkEntry.queries("q_case_agg")(spark, "/root/testdata/sf0.01")
    df.coalesce(1).write.mode("overwrite").parquet("/tmp/case_agg_probe")
    df.show(10, false)
    df.printSchema()
    spark.stop()
  }
}
