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
  /** Flat partition id from a signed `token` column, 3-broker ring × 4
    * ranges — the SQL mirror of `polar_partition(token, 3, 4)` (diffs in
    * HUGEINT so top-of-range tokens don't overflow BIGINT). */
  lazy val part34Sql: String = {
    val t1 = graft.functions.TokenMath.tokenAtIndex(3, 1) // -3074457345618259968
    val t2 = graft.functions.TokenMath.tokenAtIndex(3, 2) // 3074457345618255872
    val rangeSize = graft.functions.TokenMath.ChunkSizeUnit *
      graft.functions.TokenMath.ringFactor(3) / 4
    def rix(base: Long): String =
      s"""(CASE WHEN (token::HUGEINT - ($base)::HUGEINT) // $rangeSize >= 4 THEN 0
                ELSE (token::HUGEINT - ($base)::HUGEINT) // $rangeSize END)"""
    s"""(CASE WHEN token >= $t2 THEN 8 + ${rix(t2)}
              WHEN token >= $t1 THEN 4 + ${rix(t1)}
              ELSE ${rix(Long.MinValue)} END)"""
  }

  /** First 15 hex chars of a lowercase hex expression as a BIGINT — the
    * DuckDB mirror of [[graft.operators.Dedup.md5Hash60]]. */
  def hex15ToInt(hexExpr: String): String =
    // lambda params use reserved __-prefixed names: a caller's $hexExpr may
    // itself reference outer columns (e.g. a LATERAL position `i`), and a
    // plain `i` here would shadow them — the r6 text_winnowing oracle bug
    s"""list_reduce(list_transform(generate_series(1, 15),
        __hx -> CAST(strpos('0123456789abcdef', substr($hexExpr, __hx, 1)) - 1 AS BIGINT)),
        (__ha, __hb) -> __ha * 16 + __hb)"""

  /** md5Hash60 of a column rendered as VARCHAR. */
  def md5Hash60(colExpr: String): String =
    hex15ToInt(s"md5(CAST($colExpr AS VARCHAR))")

  /** Winnowing CTE chain over `documents` rows matching `where`
    * (k=8, w=4): gram hashes → packed (hash, pad-inverted pos) keys →
    * per-window MIN with the rightmost-tie rule → `u(doc_id, mn)`, the
    * distinct selected keys. Mirrors
    * `graft.operators.TextAnalysis.winnowingFingerprints`; shared by the
    * batch winnowing gates and `stream_winnow`. */
  def winnowCtes(where: String): String = s"""
        d AS (
          SELECT doc_id, text FROM documents
          WHERE ($where) AND length(text) >= 11),
        g AS (
          SELECT doc_id, CAST(i AS BIGINT) AS i,
                 ${md5Hash60("substr(text, CAST(i AS INTEGER), 8)")} AS h
          FROM d, LATERAL (SELECT unnest(generate_series(1, length(text) - 7)) AS i) t),
        p AS (
          SELECT doc_id, i,
                 printf('%015x', h) || printf('%09d', 999999999 - i) AS pk
          FROM g),
        s AS (
          SELECT doc_id, i,
                 COUNT(*) OVER (PARTITION BY doc_id) AS gcnt,
                 MIN(pk) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
          FROM p),
        u AS (SELECT DISTINCT doc_id, mn FROM s WHERE i <= gcnt - 3)"""

  /**
   * Cassandra-variant murmur3 x64-128 H1 of SHORT keys (≤ 8 UTF-8 bytes:
   * only the k1 tail block + finalization run), replayed in DuckDB HUGEINT
   * arithmetic — an independent cross-check of the
   * [[graft.functions.Murmur3]] kernel, validated against the gocql golden
   * vectors. Emitted as a chain of CTEs over a `(pk)` relation named
   * `keys`; the final relation `murmur_tok` has columns (pk, token).
   *
   * 64-bit ops on the unsigned view u ∈ [0, 2^64): multiplies split the
   * constant into 32-bit limbs so products stay under 2^127; xor works on
   * 32-bit halves (DuckDB xor is BIGINT-only).
   */
  // Every stage is AS MATERIALIZED: DuckDB INLINES single-reference CTEs,
  // and xs33/mulC reference their input 2-3x each — 15 stacked stages
  // inline to a ~3^15-node expression tree (measured: 13 MINUTES for the
  // polar_assign oracle at sf0.01; 0.06 s materialized). The driver's
  // correctness harness runs these oracles under a timeout, so the hint is
  // load-bearing, not cosmetic.
  def murmur3H1ShortKeyCtes: String = {
    val M64 = "18446744073709551616::HUGEINT"
    def mulC(a: String, c: BigInt): String = {
      val (ch, cl) = (c >> 32, c & 0xFFFFFFFFL)
      s"((($a) * $cl::HUGEINT + ((($a) * $ch::HUGEINT) % 4294967296) * 4294967296) % $M64)"
    }
    def xs33(x: String): String =
      s"((($x) // 4294967296) * 4294967296 + " +
        s"xor(CAST(($x) % 4294967296 AS BIGINT), CAST(($x) // 8589934592 AS BIGINT))::HUGEINT)"
    def rotl31(x: String): String =
      s"(((($x) * 2147483648::HUGEINT) % $M64) + (($x) // 8589934592))"
    def add(a: String, b: String): String = s"((($a) + ($b)) % $M64)"
    def xorLo(x: String, small: String): String =
      s"((($x) // 4294967296) * 4294967296 + " +
        s"xor(CAST(($x) % 4294967296 AS BIGINT), $small)::HUGEINT)"
    val c1 = BigInt("87c37b91114253d5", 16)
    val c2 = BigInt("4cf5ad432745937f", 16)
    val f1 = BigInt("ff51afd7ed558ccd", 16)
    val f2 = BigInt("c4ceb9fe1a85ec53", 16)
    s"""mm_b AS MATERIALIZED (SELECT pk, hex(encode(pk)) AS hx FROM keys),
      mm_k0 AS MATERIALIZED (
        SELECT pk, CAST(length(hx)//2 AS BIGINT) AS len,
               COALESCE(list_sum(list_transform(generate_series(0, length(hx)//2 - 1),
                 i -> CAST(16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1))-1)
                           + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1))-1) AS HUGEINT)
                      * (1::HUGEINT << (8*i)))), 0)::HUGEINT AS k1
        FROM mm_b),
      mm_k1m AS MATERIALIZED (SELECT pk, len, ${mulC("k1", c1)} AS k1 FROM mm_k0),
      mm_k1r AS MATERIALIZED (SELECT pk, len, ${rotl31("k1")} AS k1 FROM mm_k1m),
      mm_k1f AS MATERIALIZED (SELECT pk, len, ${mulC("k1", c2)} AS k1 FROM mm_k1r),
      mm_hl AS MATERIALIZED (SELECT pk, ${xorLo("k1", "len")} AS h1, len::HUGEINT AS h2 FROM mm_k1f),
      mm_s1 AS MATERIALIZED (SELECT pk, ${add("h1", "h2")} AS h1, h2 FROM mm_hl),
      mm_s2 AS MATERIALIZED (SELECT pk, h1, ${add("h2", "h1")} AS h2 FROM mm_s1),
      mm_f1a AS MATERIALIZED (SELECT pk, ${xs33("h1")} AS h1, h2 FROM mm_s2),
      mm_f1b AS MATERIALIZED (SELECT pk, ${mulC("h1", f1)} AS h1, h2 FROM mm_f1a),
      mm_f1c AS MATERIALIZED (SELECT pk, ${xs33("h1")} AS h1, h2 FROM mm_f1b),
      mm_f1d AS MATERIALIZED (SELECT pk, ${mulC("h1", f2)} AS h1, h2 FROM mm_f1c),
      mm_f1e AS MATERIALIZED (SELECT pk, ${xs33("h1")} AS h1, h2 FROM mm_f1d),
      mm_f2a AS MATERIALIZED (SELECT pk, h1, ${xs33("h2")} AS h2 FROM mm_f1e),
      mm_f2b AS MATERIALIZED (SELECT pk, h1, ${mulC("h2", f1)} AS h2 FROM mm_f2a),
      mm_f2c AS MATERIALIZED (SELECT pk, h1, ${xs33("h2")} AS h2 FROM mm_f2b),
      mm_f2d AS MATERIALIZED (SELECT pk, h1, ${mulC("h2", f2)} AS h2 FROM mm_f2c),
      mm_f2e AS MATERIALIZED (SELECT pk, h1, ${xs33("h2")} AS h2 FROM mm_f2d),
      mm_fin AS MATERIALIZED (SELECT pk, ${add("h1", "h2")} AS u FROM mm_f2e),
      murmur_tok AS MATERIALIZED (
        SELECT pk, CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                             THEN u - $M64 ELSE u END AS BIGINT) AS token
        FROM mm_fin)"""
  }
}
