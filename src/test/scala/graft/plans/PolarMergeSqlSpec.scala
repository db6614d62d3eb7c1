package graft.plans

import graft.GraftSession
import graft.log.{LogMetadata, PolarLog, TopicConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SQL `MERGE INTO polar.t` → log-merge rewrite: the star clause set
  * executes as one produce with KTable semantics; every other MERGE shape
  * keeps the engine's refusal (pointing at CALL polar.system.merge). */
class PolarMergeSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("polar_merge_sql").toString
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.catalog.polar", classOf[graft.sources.PolarCatalog].getName)
      .config("spark.sql.catalog.polar.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def view(topic: String): Map[String, String] =
    PolarLog.consumeCompacted(spark, TopicConfig(root, topic))
      .selectExpr("partitionKey", "CAST(value AS STRING)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def mkSource(name: String, rows: Seq[(String, String)]): Unit = {
    val spark2 = spark; import spark2.implicits._
    rows.toDF("partitionKey", "v")
      .selectExpr("partitionKey", "current_timestamp() AS timestamp",
        "CAST(v AS BINARY) AS value")
      .createOrReplaceTempView(name)
  }

  test("UPDATE SET * + INSERT * upserts; NULL source values delete from the view") {
    spark.sql("CREATE TABLE polar.msql")
    mkSource("base_src", Seq("a" -> "1", "b" -> "1", "c" -> "1"))
    spark.sql("INSERT INTO polar.msql SELECT * FROM base_src")
    mkSource("chg_src",
      Seq("b" -> "2", "d" -> "2", "a" -> null)) // update, insert, delete
    val appended = spark.sql("""
      MERGE INTO polar.msql t USING chg_src s
      ON t.partitionKey = s.partitionKey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").head().getLong(0)
    // the full-star merge is ONE produce of the change set, no view read
    assert(appended === 3L)
    assert(view("msql") === Map("b" -> "2", "c" -> "1", "d" -> "2"))
    // the raw log keeps every prior offset addressable (append, not rewrite)
    assert(PolarLog.consume(spark, TopicConfig(root, "msql")).count() === 6L)
  }

  test("INSERT * alone touches only unmatched keys; UPDATE SET * alone only matched") {
    spark.sql("CREATE TABLE polar.msql2")
    mkSource("base2_src", Seq("a" -> "1", "b" -> "1"))
    spark.sql("INSERT INTO polar.msql2 SELECT * FROM base2_src")
    mkSource("chg2_src", Seq("a" -> "X", "z" -> "X"))
    spark.sql("""
      MERGE INTO polar.msql2 t USING chg2_src s
      ON t.partitionKey = s.partitionKey
      WHEN NOT MATCHED THEN INSERT *""")
    assert(view("msql2") === Map("a" -> "1", "b" -> "1", "z" -> "X"),
      "insert-only must not update the matched key")
    mkSource("chg3_src", Seq("b" -> "Y", "q" -> "Y"))
    spark.sql("""
      MERGE INTO polar.msql2 t USING chg3_src s
      ON t.partitionKey = s.partitionKey
      WHEN MATCHED THEN UPDATE SET *""")
    assert(view("msql2") === Map("a" -> "1", "b" -> "Y", "z" -> "X"),
      "update-only must not insert the unmatched key")
  }

  test("merge source may be a query with extra columns; result matches the procedure") {
    spark.sql("CREATE TABLE polar.msql3")
    spark.sql("CREATE TABLE polar.msql3p")
    mkSource("base3_src", Seq("k1" -> "v", "k2" -> "v"))
    spark.sql("INSERT INTO polar.msql3 SELECT * FROM base3_src")
    spark.sql("INSERT INTO polar.msql3p SELECT * FROM base3_src")
    val spark2 = spark; import spark2.implicits._
    Seq(("k2", "w", 42), ("k9", "w", 43)).toDF("partitionKey", "v", "extra")
      .selectExpr("partitionKey", "current_timestamp() AS timestamp",
        "CAST(v AS BINARY) AS value", "extra")
      .createOrReplaceTempView("chg4_src")
    spark.sql("""
      MERGE INTO polar.msql3 t USING (SELECT * FROM chg4_src) s
      ON t.partitionKey = s.partitionKey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    spark.sql(
      "CALL polar.system.merge(topic => 'msql3p', source => 'chg4_src')")
    assert(view("msql3") === view("msql3p"),
      "SQL MERGE and the procedure must agree")
  }

  test("unsupported shapes keep the refusal: assignments, conditions, wrong key") {
    spark.sql("CREATE TABLE polar.msql4")
    mkSource("base4_src", Seq("a" -> "1"))
    spark.sql("INSERT INTO polar.msql4 SELECT * FROM base4_src")
    mkSource("chg5_src", Seq("a" -> "2"))
    // explicit column assignments: engine-assigned columns make them unsound
    val e1 = intercept[Exception] { spark.sql("""
      MERGE INTO polar.msql4 t USING chg5_src s
      ON t.partitionKey = s.partitionKey
      WHEN MATCHED THEN UPDATE SET t.value = s.value""") }
    assert(e1.getMessage != null)
    // conditioned star clause: not the default clause set
    val e2 = intercept[Exception] { spark.sql("""
      MERGE INTO polar.msql4 t USING chg5_src s
      ON t.partitionKey = s.partitionKey
      WHEN MATCHED AND s.value IS NOT NULL THEN UPDATE SET *""") }
    assert(e2.getMessage != null)
    // a non-partitionKey merge key contradicts the placement contract
    val e3 = intercept[Exception] { spark.sql("""
      MERGE INTO polar.msql4 t USING chg5_src s
      ON t.value = s.value
      WHEN MATCHED THEN UPDATE SET *""") }
    assert(e3.getMessage != null)
    // same-side tautologies must NOT rewrite: under real MERGE semantics
    // they match every source row against every target row — silently
    // running the keyed upsert instead would execute a different statement
    val e4 = intercept[Exception] { spark.sql("""
      MERGE INTO polar.msql4 t USING chg5_src s
      ON t.partitionKey = t.partitionKey
      WHEN MATCHED THEN UPDATE SET *""") }
    assert(e4.getMessage != null)
    val e5 = intercept[Exception] { spark.sql("""
      MERGE INTO polar.msql4 t USING chg5_src s
      ON s.partitionKey = s.partitionKey
      WHEN MATCHED THEN UPDATE SET *""") }
    assert(e5.getMessage != null)
    // and the view is untouched by all five refusals
    assert(view("msql4") === Map("a" -> "1"))
  }

  test("source column casing follows the resolver: PARTITIONKEY/VALUE merges fine") {
    spark.sql("CREATE TABLE polar.msql5")
    mkSource("base5_src", Seq("a" -> "1"))
    spark.sql("INSERT INTO polar.msql5 SELECT * FROM base5_src")
    val spark2 = spark; import spark2.implicits._
    Seq(("a", "2"), ("b", "2")).toDF("PARTITIONKEY", "v")
      .selectExpr("PARTITIONKEY", "current_timestamp() AS TIMESTAMP",
        "CAST(v AS BINARY) AS VALUE")
      .createOrReplaceTempView("chg6_src")
    spark.sql("""
      MERGE INTO polar.msql5 t USING chg6_src s
      ON t.partitionKey = s.PARTITIONKEY
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(view("msql5") === Map("a" -> "2", "b" -> "2"))
  }
}
