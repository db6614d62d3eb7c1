package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: token counting, quality
 * scoring, heuristic language ID, document fingerprinting. All pure column
 * expressions (codegen'd, no UDFs) so they run at scan speed over 100 TB of
 * documents; every function here has an exact SQL mirror used by the
 * correctness oracle.
 */
object TextAnalysis {

  /** Whitespace-delimited token count (regexp matches of non-space runs —
    * robust to repeated/leading/trailing whitespace). */
  def tokenCount(text: Column): Column = regexp_count(text, lit("[^ ]+"))

  /** Tokens of a document, lowercased (the unit for shingles/simhash). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** A BPE-ish piece-count estimate: one piece per token plus one per 16
    * chars — a cheap deterministic stand-in for a real tokenizer's count. */
  def subwordCount(text: Column): Column =
    (tokenCount(text) + floor(length(text) / lit(16))).cast("long")

  def punctCount(text: Column): Column = regexp_count(text, lit("[.,;:!?]"))

  private val EnStopwords = "(the|and|of|to|in|a|is|it|for|on)"

  def stopwordCount(text: Column): Column =
    regexp_count(lower(text), lit(s"\\b$EnStopwords\\b"))

  /** Composite quality score in fixed double-op order (oracle-mirrorable):
    * favors mid-length documents with low punctuation noise and a sane
    * stopword rate. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val punct = punctCount(text).cast("double")
    val stops = stopwordCount(text).cast("double")
    val lenScore = least(nChars / lit(500.0), lit(1.0))
    val punctPenalty = punct / (nChars + lit(1.0))
    val stopScore = least(stops / (nTokens + lit(1.0)) * lit(5.0), lit(1.0))
    round(lenScore * lit(0.5) + stopScore * lit(0.3) +
      (lit(1.0) - punctPenalty) * lit(0.2), 6)
  }

  /** Heuristic language ID: marker-stopword hit counts per language, argmax
    * with fixed tiebreak order (en > es > de > fr > zh > und). The marker
    * approach is the classic n-gram/profile heuristic collapsed to its
    * highest-signal features, chosen to be exactly SQL-mirrorable. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|it)\\b",
    "es" -> "\\b(el|la|los|las|de|que|y|es)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein)\\b",
    "fr" -> "\\b(le|les|des|et|est|une|dans)\\b",
    "zh" -> "[\\u4e00-\\u9fff]")

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, re) =>
      lang -> regexp_count(lower(text), lit(re))
    }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s > 0 && s === maxScore, lit(lang)).otherwise(els)
    }
  }

  // ------------------------------------------------------------------ PII
  // Patterns restricted to the RE2 ∩ java.util.regex common subset so the
  // DuckDB oracle runs them verbatim. Replacement order matters: emails
  // first (their local part can contain digits/dots), then phones, then
  // bare IPv4s.

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def ipCount(text: Column): Column = regexp_count(text, lit(Ipv4Re))

  /** PII scrubbing for training corpora: emails, phone numbers and IPv4
    * addresses replaced with typed placeholder tokens. Pure regexp_replace
    * chain — codegen'd, scan-speed, no UDFs; counts come from the same
    * patterns so "what was removed" is auditable per document. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>")),
      lit(Ipv4Re), lit("<IP>"))
}
