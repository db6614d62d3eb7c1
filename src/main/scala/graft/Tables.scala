package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the harness tables (`/root/testdata/sf*`).
 *
 * `events.parquet` carries a nanosecond-precision timestamp, which Spark 4's
 * parquet reader rejects unless `spark.sql.legacy.parquet.nanosAsLong` is on;
 * with it on, `ts` arrives as a long of epoch nanos. We normalize to the
 * engine's native micros precision (the reference's envelope precision,
 * `/root/reference/internal/producing/models.go:146-150`) — `ts` becomes a
 * proper TimestampType truncated to micros, matching DuckDB's
 * `CAST(ts AS TIMESTAMP)` on the same file.
 */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    name match {
      case "events" =>
        // `div` = exact integer division: `/` would go through DOUBLE, and
        // epoch NANOS (~1.7e18) exceed double precision — rounding some
        // micros by ±1 vs DuckDB's truncating CAST(ts AS TIMESTAMP)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // the nanos flag is consulted by read TASKS via the session conf, so it
    // cannot be scoped to one read; GraftSession sets it at build time and
    // this guards sessions the engine did not build (the driver's)
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
