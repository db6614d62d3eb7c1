package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/**
 * Byte-pair encoding: the real subword tokenizer behind the pluggable
 * `tokenCounter` hooks ([[graft.operators.TextAnalysis.stats]],
 * [[graft.operators.Curation.packDocuments]]). Two halves:
 *
 *  - [[Bpe.learnMerges]] — the classic merge-learning loop (Sennrich et al.
 *    2016, "Neural Machine Translation of Rare Words with Subword Units"):
 *    greedily merge the most frequent adjacent symbol pair of a
 *    word-frequency table. Runs on the DRIVER over a bounded top-V word
 *    table (a vocabulary is corpus-scale-independent), which is how
 *    production BPE trainers consume a 100 TB corpus too: one distributed
 *    word-count, one bounded merge loop.
 *  - [[BpeEncoder]] — the encoder: per word, start from single characters
 *    and apply each learned merge in rank order with a left-to-right
 *    non-overlapping scan. Exactly equivalent to the sed/replace chain the
 *    DuckDB oracle replays (each merge = one global `replace` over a
 *    double-space-separated symbol string), so BPE piece counts are
 *    hash-verifiable cross-engine.
 *
 * Both halves are deterministic: merge ties break on (count desc, pair
 * lexicographic), encoding is a pure function of (merges, word).
 */
object Bpe {

  /** Word → its single-codepoint base symbols. */
  private[functions] def baseSymbols(w: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One left-to-right non-overlapping merge pass (the BPE apply step and
    * the exact semantics of a single global string `replace`). */
  private[functions] def mergeOnce(
      syms: Array[String], a: String, b: String): Array[String] = {
    val buf = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        buf += (a + b); i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toArray
  }

  /**
   * Learn `numMerges` BPE merges from a word-frequency table. Stops early
   * when no adjacent pair occurs at least twice (merging a count-1 pair
   * never helps compression). Deterministic: the winning pair maximizes
   * count with ties to the lexicographically smallest (a, b).
   */
  def learnMerges(
      wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var vocab = wordCounts.map { case (w, c) => (baseSymbols(w), c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < 2) done = true
        else {
          merges += pair
          vocab = vocab.map { case (syms, c) => (mergeOnce(syms, pair._1, pair._2), c) }
        }
      }
    }
    merges.toSeq
  }
}

/**
 * Serializable BPE encoder over a fixed merge list. Tokenization matches
 * [[graft.operators.TextAnalysis.tokens]] (locale-independent lowercase,
 * whitespace split, empties dropped); encoding applies merges in rank
 * order. A bounded concurrent per-executor cache memoizes distinct words —
 * natural corpora are Zipfian, so the hit rate is high and the cache stays
 * small.
 */
final class BpeEncoder(val merges: Seq[(String, String)]) extends Serializable {
  import Bpe._

  private val MaxCache = 1 << 16
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  def encodeWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms = baseSymbols(w)
    merges.foreach { case (a, b) => if (syms.length >= 2) syms = mergeOnce(syms, a, b) }
    if (cache.size < MaxCache) cache.put(w, syms)
    syms
  }

  /** All BPE pieces of a document, word order preserved. */
  def pieces(text: UTF8String): GenericArrayData = {
    val out = mutable.ArrayBuffer.empty[UTF8String]
    forEachWord(text) { w =>
      encodeWord(w).foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Total BPE piece count of a document. */
  def countDoc(text: UTF8String): Long = {
    var n = 0L
    forEachWord(text)(w => n += encodeWord(w).length)
    n
  }

  private def forEachWord(text: UTF8String)(f: String => Unit): Unit = {
    // UTF8String.toLowerCase is locale-independent (matches Spark's lower())
    val s = text.toLowerCase.toString
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) f(s.substring(start, i))
    }
  }
}

private[functions] sealed trait BpeExpression extends UnaryExpression {
  def merges: Seq[(String, String)]
  @transient protected lazy val encoder = new BpeEncoder(merges)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }
}

/** `bpe_count(string) -> long` — total BPE piece count of a document under
  * a fixed merge list: the real-tokenizer drop-in for every pluggable
  * `tokenCounter` hook. */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends BpeExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"
  override def nullSafeEval(v: Any): Any = encoder.countDoc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", encoder, "graft.functions.BpeEncoder")
    defineCodeGen(ctx, ev, c => s"$ref.countDoc($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeCount = copy(child = c)
}

/** `bpe_pieces(string) -> array<string>` — the document's BPE pieces in
  * order (subword vocabulary building, piece-level stats). */
case class BpePieces(child: Expression, merges: Seq[(String, String)])
    extends BpeExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pieces"
  override def nullSafeEval(v: Any): Any = encoder.pieces(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", encoder, "graft.functions.BpeEncoder")
    defineCodeGen(ctx, ev, c => s"$ref.pieces($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpePieces = copy(child = c)
}
