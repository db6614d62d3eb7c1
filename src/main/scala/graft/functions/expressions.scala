package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `murmur3_h1(string|binary) -> long` — the reference partitioner hash
 * (`/root/reference/internal/types/murmur.go:37`, SURVEY.md §2 Table B
 * "scalar functions"). Codegen'd: stays inside whole-stage codegen so hashing
 * 100 TB of keys never leaves the generated loop.
 */
case class Murmur3H1(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "murmur3_h1"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"murmur3_h1 requires string or binary input, got ${other.catalogString}")
    }

  private def isString = child.dataType.isInstanceOf[StringType]

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => Murmur3.hashUtf8(s)
    case b: Array[Byte] => Murmur3.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString) defineCodeGen(ctx, ev, c => s"graft.functions.Murmur3.hashUtf8($c)")
    else defineCodeGen(ctx, ev, c => s"graft.functions.Murmur3.hash($c)")

  override protected def withNewChildInternal(c: Expression): Murmur3H1 = copy(child = c)
}

/**
 * `polar_partition(token, clusterSize, rangesPerToken) -> int` — flattened
 * `(brokerIndex, rangeIndex)` owning a token; the placement function of the
 * reference (`/root/reference/internal/types/token.go:49-66`,
 * `internal/discovery/discoverer.go:343-368`). A shuffle on this value is the
 * reference's leader routing (SURVEY.md §2 A3).
 */
case class PolarPartition(child: Expression, clusterSize: Int, rangesPerToken: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "polar_partition"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"polar_partition requires a long token, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TokenMath.partitionForToken(v.asInstanceOf[Long], clusterSize, rangesPerToken)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenMath.partitionForToken($c, $clusterSize, $rangesPerToken)")

  override protected def withNewChildInternal(c: Expression): PolarPartition = copy(child = c)
}

/** Registration + Column-level API for the graft engine's native functions. */
object GraftFunctions {
  import org.apache.spark.sql.graftshims.GraftShims

  private def intArg(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "murmur3_h1" -> ((args: Seq[Expression]) => Murmur3H1(args.head)),
    "polar_partition" -> ((args: Seq[Expression]) =>
      PolarPartition(args.head, intArg(args(1)), intArg(args(2)))),
    "simhash64" -> ((args: Seq[Expression]) => SimHash64(args.head)),
    "md5_hash60" -> ((args: Seq[Expression]) => Md5Hash60(args.head)),
    "md5_simhash60" -> ((args: Seq[Expression]) => Md5Simhash60(args.head)),
    "hyperplane_lsh" -> ((args: Seq[Expression]) =>
      HyperplaneLsh(args.head, intArg(args(1)), intArg(args(2)))),
    "rolling_fingerprint" -> ((args: Seq[Expression]) => RollingFingerprint(args.head)),
    "polar_frames" -> ((args: Seq[Expression]) => PolarFrames(args.head)),
    "sorted_jaccard" -> ((args: Seq[Expression]) => SortedJaccard(args(0), args(1))),
    "word_shingles" -> ((args: Seq[Expression]) => WordShingles(args.head, intArg(args(1)))),
    "word_ngrams" -> ((args: Seq[Expression]) => WordNgrams(args.head, intArg(args(1)))),
    "vec_dot" -> ((args: Seq[Expression]) => VecDot(args(0), args(1))),
    "vec_cosine" -> ((args: Seq[Expression]) => VecCosine(args(0), args(1))),
    "vec_l2sq_long" -> ((args: Seq[Expression]) => VecL2SqLong(args(0), args(1))),
    "morton2" -> ((args: Seq[Expression]) => Morton2(args(0), args(1))),
    "levenshtein_bounded" -> ((args: Seq[Expression]) =>
      LevenshteinBounded(args(0), args(1), intArg(args(2)))),
    "char_qgram_hist" -> ((args: Seq[Expression]) =>
      CharQgramHist(args(0), intArg(args(1)), intArg(args(2)))),
    "char_qgram_sketch" -> ((args: Seq[Expression]) =>
      CharQgramSketch(args(0), intArg(args(1)))),
    "qgram_common_upper_sorted" -> ((args: Seq[Expression]) =>
      QgramCommonUpperSorted(args(0), args(1))),
    "cdc_chunk_fps" -> ((args: Seq[Expression]) =>
      CdcChunkFps(args(0), intArg(args(1)), intArg(args(2)))),
    "cdc_chunk_lens" -> ((args: Seq[Expression]) =>
      CdcChunkLens(args(0), intArg(args(1)), intArg(args(2)))),
    "cdc_chunk_texts" -> ((args: Seq[Expression]) =>
      CdcChunkTexts(args(0), intArg(args(1)), intArg(args(2)))),
    "ahash64" -> ((args: Seq[Expression]) => AHash64(args.head)),
    "qgram_common_upper" -> ((args: Seq[Expression]) =>
      QgramCommonUpper(args(0), args(1))),
    "hll60" -> ((args: Seq[Expression]) => Hll60(args.head)),
    "vec_outer_sum" -> ((args: Seq[Expression]) =>
      VecOuterSum(args(0), intArg(args(1)))))

  /** SparkSessionExtensions hook — wired by [[graft.GraftSession]]. */
  def install(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name), b))
    }

  /** SQL-name registration on an already-built session (driver's Verify /
    * Bench sessions). Idempotent: already-registered names are skipped (a
    * re-register would log a "replaced a previously registered function"
    * warning per name per query). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      if (!GraftShims.functionExists(spark, name)) {
        GraftShims.registerFunction(spark, name, new ExpressionInfo(getClass.getName, name), b)
      }
    }

  /** Token of a partition key (Cassandra murmur3 x64 H1). */
  def murmur3_h1(c: Column): Column = GraftShims.column(Murmur3H1(GraftShims.expression(c)))

  /** Flat partition id `brokerIndex * rangesPerToken + rangeIndex` of a token. */
  def polar_partition(token: Column, clusterSize: Int, rangesPerToken: Int): Column =
    GraftShims.column(PolarPartition(GraftShims.expression(token), clusterSize, rangesPerToken))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(tokens)))

  /** Engine-neutral 60-bit md5-derived content hash. */
  def md5_hash60(c: Column): Column =
    GraftShims.column(Md5Hash60(GraftShims.expression(c)))

  /** 60-bit SimHash over md5_hash60 token hashes (oracle-mirrorable). */
  def md5_simhash60(tokens: Column): Column =
    GraftShims.column(Md5Simhash60(GraftShims.expression(tokens)))

  /** All XOR-scramble minhash lanes over pre-hashed shingles, one pass. */
  def xor_minhash(hashes: Column, seeds: Seq[Long]): Column =
    GraftShims.column(XorMinhash(GraftShims.expression(hashes), seeds))

  /** Sign-random-projection LSH bucket of an embedding. */
  def hyperplane_lsh(vec: Column, numPlanes: Int, seed: Int): Column =
    GraftShims.column(HyperplaneLsh(GraftShims.expression(vec), numPlanes, seed))

  /** Karp–Rabin rolling hash fingerprint of a document. */
  def rolling_fingerprint(text: Column): Column =
    GraftShims.column(RollingFingerprint(GraftShims.expression(text)))

  /** Frames of a `{u32-BE len}{bytes}`-framed body. */
  def polar_frames(body: Column): Column =
    GraftShims.column(PolarFrames(GraftShims.expression(body)))

  /** Merge-walk Jaccard of two sorted+distinct string arrays. */
  def sorted_jaccard(a: Column, b: Column): Column =
    GraftShims.column(SortedJaccard(GraftShims.expression(a), GraftShims.expression(b)))

  /** Distinct sorted k-word shingles of a document, one codegen'd pass. */
  def word_shingles(text: Column, k: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(text), k))

  /** In-order k-word n-grams, duplicates preserved (LM counting). */
  def word_ngrams(text: Column, k: Int): Column =
    GraftShims.column(WordNgrams(GraftShims.expression(text), k))

  /** Winnowing fingerprint set of a document, one codegen'd pass. */
  def winnow_fp_set(text: Column, k: Int, w: Int): Column =
    GraftShims.column(WinnowFpSet(GraftShims.expression(text), k, w))

  /** One-pass dot product of two float/double arrays. */
  def vec_dot(a: Column, b: Column): Column =
    GraftShims.column(VecDot(GraftShims.expression(a), GraftShims.expression(b)))

  /** Banded early-exit Levenshtein: distance if ≤ max, else -1. */
  def levenshtein_bounded(a: Column, b: Column, max: Int): Column =
    GraftShims.column(LevenshteinBounded(
      GraftShims.expression(a), GraftShims.expression(b), max))

  /** Content-defined chunk fingerprints (see [[Cdc.chunkFps]]). */
  def cdc_chunk_fps(c: Column, window: Int, divisor: Int): Column =
    GraftShims.column(CdcChunkFps(GraftShims.expression(c), window, divisor))

  /** Content-defined chunk byte lengths (see [[Cdc.chunkLens]]). */
  def cdc_chunk_lens(c: Column, window: Int, divisor: Int): Column =
    GraftShims.column(CdcChunkLens(GraftShims.expression(c), window, divisor))

  /** Content-defined chunk texts (see [[Cdc.chunkTexts]]). */
  def cdc_chunk_texts(c: Column, window: Int, divisor: Int): Column =
    GraftShims.column(CdcChunkTexts(GraftShims.expression(c), window, divisor))

  /** Average-hash perceptual fingerprint of a binary payload. */
  def ahash64(c: Column): Column =
    GraftShims.column(AHash64(GraftShims.expression(c)))

  /** Hashed q-gram histogram of a string (see [[QGramFilter.hist]]). */
  def char_qgram_hist(c: Column, q: Int, buckets: Int): Column =
    GraftShims.column(CharQgramHist(GraftShims.expression(c), q, buckets))

  /** Sparse sorted q-gram sketch (see [[QGramFilter.sketch]]). */
  def char_qgram_sketch(c: Column, q: Int): Column =
    GraftShims.column(CharQgramSketch(GraftShims.expression(c), q))

  /** Sorted-merge common-q-gram upper bound (see [[QGramFilter.minSumSorted]]). */
  def qgram_common_upper_sorted(a: Column, b: Column): Column =
    GraftShims.column(QgramCommonUpperSorted(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Upper bound on two docs' common-q-gram count from their histograms. */
  def qgram_common_upper(a: Column, b: Column): Column =
    GraftShims.column(QgramCommonUpper(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** One-pass cosine similarity of two float/double arrays. */
  def vec_cosine(a: Column, b: Column): Column =
    GraftShims.column(VecCosine(GraftShims.expression(a), GraftShims.expression(b)))

  /** Integer squared L2 distance of two array<bigint> (quantized k-means
    * assignment kernel). */
  def vec_l2sq_long(a: Column, b: Column): Column =
    GraftShims.column(VecL2SqLong(GraftShims.expression(a), GraftShims.expression(b)))

  /** HLL distinct-count estimate of pre-hashed 60-bit values (aggregate). */
  def hll60(hash: Column): Column =
    GraftShims.column(Hll60(GraftShims.expression(hash)).toAggregateExpression())

  /** One-pass second-moment sums of quantized vectors (aggregate):
    * `[n, linear sums, upper-triangle products]` as one array<long>. */
  def vec_outer_sum(q: Column, dim: Int): Column =
    GraftShims.column(
      VecOuterSum(GraftShims.expression(q), dim).toAggregateExpression())

  /** BPE piece count of a document under a fixed merge list. */
  def bpe_count(text: Column, merges: Seq[(String, String)]): Column =
    GraftShims.column(BpeCount(GraftShims.expression(text), merges))

  /** BPE pieces of a document in order, under a fixed merge list. */
  def bpe_pieces(text: Column, merges: Seq[(String, String)]): Column =
    GraftShims.column(BpePieces(GraftShims.expression(text), merges))

  /** Morton (Z-order) interleave of two longs' low 32 bits. */
  def morton2(a: Column, b: Column): Column =
    GraftShims.column(Morton2(GraftShims.expression(a), GraftShims.expression(b)))

  /** Bloom-filter aggregate over xxhash64(c) — Spark's own runtime-filter
    * sketch (`org.apache.spark.util.sketch.BloomFilter`) surfaced as a
    * library aggregate; the build side of a hand-rolled semi-join filter. */
  def bloom_agg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftShims.column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(GraftShims.expression(c)), 42L),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits), 0, 0)
      .toAggregateExpression())

  /** Membership probe against a [[bloom_agg]] sketch (no false negatives). */
  def bloom_might_contain(bloom: Column, v: Column): Column =
    GraftShims.column(org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(
        GraftShims.expression(bloom),
        org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(GraftShims.expression(v)), 42L)))
}
