package graft.functions

import graft.GraftSession
import graft.functions.GraftFunctions.hll60
import graft.operators.Dedup.md5Hash60
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The graft HLL aggregate: estimation accuracy, mergeability across
  * partitions, and determinism (the properties the DuckDB oracle then
  * verifies value-for-value at the gate). */
class Hll60Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("native md5_hash60 == conv(substr(md5)) formulation, simhash matches HOF math") {
    GraftSession.ensureFunctions(spark)
    val rows = spark.range(500L)
      .selectExpr(
        "md5_hash60(cast(cast(id AS STRING) AS BINARY)) AS native",
        "CAST(conv(substr(md5(cast(cast(id AS STRING) AS BINARY)), 1, 15), 16, 10) AS BIGINT) AS viaHex")
      .filter(col("native") =!= col("viaHex")).count()
    assert(rows === 0L)
    // simhash of a single token == the token's hash (sign of ±1 per bit)
    val one = spark.sql(
      "SELECT md5_simhash60(array('tok')) = md5_hash60(cast('tok' AS BINARY)) AS eq").head()
    assert(one.getBoolean(0))
  }

  test("estimate within standard HLL error of true cardinality") {
    // m=4096 => relative error ~1.04/sqrt(m) ~ 1.6%; raw estimator without
    // corrections stays within a few percent at n >> m
    val n = 100000
    val est = spark.range(n.toLong)
      .agg(hll60(md5Hash60(col("id").cast("string"))).as("e"))
      .head().getLong(0)
    val err = math.abs(est - n).toDouble / n
    assert(err < 0.05, s"estimate $est for $n distinct (err $err)")
  }

  test("duplicates do not change the estimate (distinctness)") {
    val distinct = spark.range(5000L)
      .agg(hll60(md5Hash60(col("id").cast("string")))).head().getLong(0)
    val dup = spark.range(5000L)
      .withColumn("copy", explode(array((0 until 4).map(lit): _*)))
      .agg(hll60(md5Hash60(col("id").cast("string")))).head().getLong(0)
    assert(distinct === dup)
  }

  test("merge across partitions == single-partition result (mergeable state)") {
    val one = spark.range(20000L).repartition(1)
      .agg(hll60(md5Hash60(col("id").cast("string")))).head().getLong(0)
    val many = spark.range(20000L).repartition(16)
      .agg(hll60(md5Hash60(col("id").cast("string")))).head().getLong(0)
    assert(one === many)
  }

  test("works grouped and via SQL registration") {
    GraftSession.ensureFunctions(spark)
    // groups well above m=4096: the raw estimator (no small-range
    // correction, by design) is only accurate for n >> m
    spark.range(100000L).withColumn("g", col("id") % 2)
      .createOrReplaceTempView("hll_probe")
    val rows = spark.sql(
      """SELECT g, hll60(CAST(conv(substr(md5(cast(cast(id AS STRING) AS BINARY)), 1, 15), 16, 10) AS BIGINT)) AS e
         FROM hll_probe GROUP BY g ORDER BY g""").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val est = r.getLong(1)
      assert(math.abs(est - 50000).toDouble / 50000 < 0.06, s"group est $est")
    }
  }
}
