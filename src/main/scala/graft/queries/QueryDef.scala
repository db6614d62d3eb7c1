package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One verifiable engine capability: a Spark-side implementation plus (when
 * SQL-expressible) a DuckDB oracle over the same parquet tables. Column names
 * MUST match between the two — the correctness gate sorts columns by name
 * before hashing values.
 *
 * Determinism rules used across the battery:
 *  - double aggregations go through DECIMAL(18,2) operands (exact arithmetic,
 *    order-independent) and surface as DOUBLE;
 *  - every ORDER BY ... LIMIT carries a unique tiebreaker key;
 *  - timestamps surface as formatted strings (micros truncation is identical
 *    in both engines).
 */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryRegistry {
  def all: Seq[QueryDef]
}
