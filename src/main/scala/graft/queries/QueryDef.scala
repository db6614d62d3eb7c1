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

/** DuckDB SQL fragments shared across oracle mirrors. */
object OracleSql {
  /** First 15 hex chars of a lowercase hex expression as a BIGINT — the
    * DuckDB mirror of [[graft.operators.Dedup.md5Hash60]]. */
  def hex15ToInt(hexExpr: String): String =
    s"""list_reduce(list_transform(generate_series(1, 15),
        i -> CAST(strpos('0123456789abcdef', substr($hexExpr, i, 1)) - 1 AS BIGINT)),
        (a, b) -> a * 16 + b)"""

  /** md5Hash60 of a column rendered as VARCHAR. */
  def md5Hash60(colExpr: String): String =
    hex15ToInt(s"md5(CAST($colExpr AS VARCHAR))")
}
