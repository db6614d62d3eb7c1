package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: does Spark 4.1's WITH RECURSIVE (UnionLoop) run, and with what
  * syntax/limits? NOT part of the shipped library. */
object RecursiveCteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    try {
      val df = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM t WHERE n < 5)
          |SELECT SUM(n) AS s FROM t""".stripMargin)
      println("PROBE basic: " + df.collect().mkString(","))
    } catch { case e: Throwable => println("PROBE basic FAILED: " + e.getMessage.take(300)) }

    try {
      spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
        .createOrReplaceTempView("supplier")
      val df = spark.sql(
        """WITH RECURSIVE walk(s_suppkey, depth) AS (
          |  SELECT s_suppkey, 0 FROM supplier WHERE s_suppkey = 1
          |  UNION ALL
          |  SELECT s.s_suppkey, w.depth + 1
          |  FROM supplier s JOIN walk w ON s.s_suppkey DIV 2 = w.s_suppkey
          |  WHERE s.s_suppkey > 1)
          |SELECT depth, COUNT(*) AS n, MIN(s_suppkey) AS lo, MAX(s_suppkey) AS hi
          |FROM walk GROUP BY depth ORDER BY depth""".stripMargin)
      df.collect().foreach(r => println("PROBE tree: " + r))
      df.explain("formatted")
    } catch { case e: Throwable => println("PROBE tree FAILED: " + e.getMessage.take(500)) }

    try {
      spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .createOrReplaceTempView("nation")
      spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .createOrReplaceTempView("customer")
      val df = spark.sql(
        """SELECT n.n_name, t.c_name, t.c_acctbal
          |FROM nation n JOIN LATERAL (
          |  SELECT c_name, c_acctbal FROM customer c
          |  WHERE c.c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin)
      println("PROBE lateral rows: " + df.count())
    } catch { case e: Throwable => println("PROBE lateral FAILED: " + e.getMessage.take(400)) }

    spark.stop()
  }
}
