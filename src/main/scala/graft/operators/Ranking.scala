package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Full-text relevance ranking over the document corpus — the retrieval
 * side of a training-data pipeline (e.g. sourcing domain-specific
 * documents by query, or building retrieval-augmented eval sets).
 *
 * BM25 as one declarative plan, designed to scale:
 *  - the corpus is scanned once for statistics (N, avgdl, per-term doc
 *    frequencies — ONE 1-row aggregate) and once for scoring; the stats
 *    row joins back by broadcast, so the corpus never shuffles at all —
 *    the only exchange is the final TakeOrdered;
 *  - term frequencies come from a codegen'd `filter(tokens, ...)` per
 *    query term — never an explode of the token stream;
 *  - every score is a FIXED-ORDER expression chain over the (few) query
 *    terms, and `avgdl`'s inputs are integer-valued doubles (exact sums),
 *    so scores are bit-reproducible under any partitioning — the oracle
 *    replays them exactly.
 */
object Ranking {

  /**
   * Okapi BM25 top-k: score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
   * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (Robertson–Spärck Jones,
   * Lucene's non-negative variant). Returns (doc_id, score) ordered by
   * rounded score desc, doc_id asc; docs matching no term are dropped.
   */
  def bm25TopK(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, "terms must be a small fixed list")
    def tfOf(term: String): Column =
      size(filter(col("toks"), t => t === lit(term))).cast("double")
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    // ONE corpus-stats row: doc count, total token count (integer-valued
    // doubles — exact, order-independent), and each term's doc frequency
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
      sum(size(col("toks")).cast("double")).as("sum_dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(tfOf(t) > 0, 1.0).otherwise(0.0)).as(s"df_$i")
      }
    val stats = toks.agg(statAggs.head, statAggs.tail: _*)
    // fixed left-to-right contribution chain — deterministic FP order
    val scoreCols = col("doc_id") +: size(col("toks")).cast("double").as("dl") +:
      terms.zipWithIndex.map { case (t, i) => tfOf(t).as(s"tf_$i") }
    val scored = toks.select(scoreCols: _*).crossJoin(broadcast(stats))
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i"); val dfq = col(s"df_$i")
      val idf = log(lit(1.0) + (col("n_docs") - dfq + lit(0.5)) / (dfq + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / (col("sum_dl") / col("n_docs"))))
    }
    val score = terms.indices.map(contrib).reduceLeft(_ + _)
    scored
      .filter(terms.indices.map(i => col(s"tf_$i") > 0).reduceLeft(_ || _))
      .select(col("doc_id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
