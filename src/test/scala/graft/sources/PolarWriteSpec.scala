package graft.sources

import graft.GraftSession
import graft.log.{PolarLog, TopicConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** `df.write.format("polar")` — the DSv2 batch sink path. */
class PolarWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def records = graft.Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("user_id").cast("string").as("partitionKey"),
      col("ts").as("timestamp"), col("props").as("value"))

  test("write.format(polar) == PolarLog.produce (same placement and counts)") {
    val root = Files.createTempDirectory("polar_write_spec").toString
    records.write.format("polar")
      .option("root", root).option("topic", "w")
      .mode("append").save()
    val viaWriter = PolarLog.consume(spark, TopicConfig(root, "w"))
      .groupBy(col("part")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    val root2 = Files.createTempDirectory("polar_write_spec2").toString
    PolarLog.produce(records, TopicConfig(root2, "w"))
    val viaProduce = PolarLog.consume(spark, TopicConfig(root2, "w"))
      .groupBy(col("part")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    assert(viaWriter === viaProduce)
    assert(viaWriter.values.sum === records.count())
  }

  test("append twice extends offsets; overwrite is rejected") {
    val root = Files.createTempDirectory("polar_write_spec3").toString
    val few = records.limit(50)
    few.write.format("polar").option("root", root).option("topic", "w")
      .mode("append").save()
    few.write.format("polar").option("root", root).option("topic", "w")
      .mode("append").save()
    val log = PolarLog.consume(spark, TopicConfig(root, "w"))
    assert(log.count() === 100)
    // offsets stay dense across appends
    val dense = log.groupBy(col("part"))
      .agg(count(lit(1)).as("n"), (max(col("offset")) + 1).as("span"))
      .filter(col("n") =!= col("span")).count()
    assert(dense === 0)

    val ex = intercept[Exception] {
      few.write.format("polar").option("root", root).option("topic", "w")
        .mode("overwrite").save()
    }
    assert(ex.getMessage != null)
  }
}
