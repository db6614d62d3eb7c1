package graft.functions

import graft.GraftSession
import graft.functions.GraftFunctions.{murmur3_h1, polar_partition}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The soundness contract of the partitionKey pushdown, DPP key mapping
  * and storage-partitioned join: the DRIVER-side placement
  * (`TokenMath.partitionForToken(Murmur3.hashString(k))`, what the scan
  * builder prunes with) must equal the ENGINE-side placement
  * (`polar_partition(murmur3_h1(k))`, what the produce path routes with)
  * for every key and every valid ring. A single divergent key would make
  * key pruning silently drop that key's records. */
class KeyPlacementPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("driver placement == engine placement for random keys on every ring") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1234567L) // deterministic corpus
    val keys = (Seq.fill(400)(
        rnd.alphanumeric.take(rnd.nextInt(24) + 1).mkString) ++
      Seq("", "1", "0", "null", "Ω≈ç√ unicode", "日本語キー", "a" * 200,
        "\ttab\nnewline", "emoji 🚀🔥", "ascii-edge ")).distinct
    val df = keys.toDF("partitionKey")
    for ((cs, rpt) <- Seq((3, 4), (6, 2), (12, 1), (1, 4), (3, 8))) {
      val got = df.select(col("partitionKey"),
        polar_partition(murmur3_h1(col("partitionKey")), cs, rpt).as("part"))
        .collect()
      assert(got.length === keys.length)
      got.foreach { r =>
        val k = r.getString(0)
        val engine = r.getInt(1)
        val driver = TokenMath.partitionForToken(
          Murmur3.hashString(k), cs, rpt)
        assert(engine === driver,
          s"key '$k' ring ($cs x $rpt): engine=$engine driver=$driver")
      }
    }
  }
}
