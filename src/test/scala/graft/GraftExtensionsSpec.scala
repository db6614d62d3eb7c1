package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-injectable packaging hook: a session built ONLY with
  * `spark.sql.extensions=graft.GraftExtensions` (no GraftSession code path)
  * must expose the engine's SQL functions. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions installs the function surface") {
    // extensions apply at session CONSTRUCTION: clear any session another
    // suite left active so getOrCreate really builds a fresh one
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext_spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = spark.sql("SELECT murmur3_h1('0123')").head().getLong(0)
      assert(got === 0x0f95757ce7f38254L) // gocql golden vector
      assert(spark.sql("SELECT word_shingles('a b c', 2)").head()
        .getSeq[String](0) === Seq("a b", "b c"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
