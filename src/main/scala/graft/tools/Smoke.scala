package graft.tools

import graft.GraftSession
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** End-to-end smoke: drives the engine's public surface in a real Spark
  * session — SQL function registry, codegen'd expressions, testdata scan.
  * Run: `sbt "runMain graft.tools.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._

    // 1. SQL surface: registered native function over literals
    spark.sql(
      """SELECT murmur3_h1('abcd') AS t_abcd,
        |       murmur3_h1('hello') AS t_hello,
        |       polar_partition(murmur3_h1('123'), 3, 4) AS p_123
        |""".stripMargin).show(truncate = false)

    // 2. Column surface over real data: token + partition of event keys
    val events = graft.Tables.events(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val placed = events
      .withColumn("token", murmur3_h1($"user_id".cast("string")))
      .withColumn("partition", polar_partition($"token", 3, 4))
    placed.groupBy($"partition").agg(count("*").as("n"),
      countDistinct($"user_id").as("users"))
      .orderBy($"partition").show(50)

    // 3. Codegen check: the expression must be inside WholeStageCodegen
    placed.select($"token").explain("codegen")

    // 4. Probes: null key -> null token (round-robin placement happens at the
    // sink, not in the hash); binary input; wrong type -> analysis error
    spark.sql("SELECT murmur3_h1(CAST(NULL AS STRING)) AS null_token, " +
      "murmur3_h1(CAST('abcd' AS BINARY)) AS bin_token").show()
    try {
      spark.sql("SELECT murmur3_h1(42)").collect()
      println("PROBE FAIL: int input was accepted")
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        println(s"PROBE OK: int input rejected: ${e.getMessage.linesIterator.next()}")
    }
    spark.stop()
  }
}
