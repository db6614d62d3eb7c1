package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * chars — a cheap deterministic stand-in for a real tokenizer's count.
    * Every consumer takes it as a pluggable `tokenCounter: Column =>
    * Column` default ([[stats]], [[Curation.packDocuments]]), so a real
    * BPE count drops in without touching the operators. */
  def subwordCount(text: Column): Column =
    (tokenCount(text) + floor(length(text) / lit(16))).cast("long")

  /** The standard per-document stats projection (token/subword/punct/
    * stopword counts + composite quality) with a PLUGGABLE subword
    * counter: swap in a real tokenizer's count without touching callers.
    * Pure column expressions — one codegen'd pass over the corpus. */
  def stats(
      df: DataFrame,
      textCol: String,
      idCol: String,
      tokenCounter: Column => Column = subwordCount): DataFrame =
    df.select(col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      tokenCounter(col(textCol)).as("n_subwords"),
      punctCount(col(textCol)).as("n_punct"),
      stopwordCount(col(textCol)).as("n_stops"),
      qualityScore(col(textCol)).as("quality"))

  def punctCount(text: Column): Column = regexp_count(text, lit("[.,;:!?]"))

  /**
   * Flesch reading-ease readability: 206.835 − 1.015·(words/sentences) −
   * 84.6·(syllables/words), with the classic vowel-group syllable
   * heuristic (runs of [aeiouy], min 1 per word — the standard
   * dictionary-free approximation). All inputs are integer counts; the
   * score is emitted floor-quantized to 1e-4 (`flesch_q`) so there is no
   * decimal re-round for engines to disagree on. One codegen'd
   * projection, no shuffle — the same pure-column-expression shape as
   * [[stats]], composable as a `scorer` into the quality-gating
   * operators.
   */
  def readability(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = filter(split(lower(col(textCol)), "\\s+"), w => length(w) > 0)
    val nWords = greatest(lit(1L), size(words).cast("long"))
    val nSentences = greatest(lit(1L),
      regexp_count(col(textCol), lit("[.!?]+")).cast("long"))
    // vowel-group runs over the whole text + one per all-consonant word
    // (per-word minimum of 1) — avoids a per-word interpreted loop
    val nSyllables =
      (regexp_count(lower(col(textCol)), lit("[aeiouy]+")) +
        size(filter(words, w => !w.rlike("[aeiouy]")))).cast("long")
    val score = lit(206.835) -
      lit(1.015) * (nWords.cast("double") / nSentences.cast("double")) -
      lit(84.6) * (nSyllables.cast("double") / nWords.cast("double"))
    df.select(col(idCol), nWords.as("n_words"), nSentences.as("n_sentences"),
      nSyllables.as("n_syllables"),
      floor(score * lit(10000d)).cast("long").as("flesch_q"))
  }

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
    // bind the five marker counts ONCE per row: referencing each score in
    // both the max and its own comparison would re-run every regexp_count
    // ~3x (Catalyst inlines per reference — see Curation.bindOnce)
    Curation.bindOnce(array(scores.map(_._2): _*)) { arr =>
      val maxScore = array_max(arr)
      scores.zipWithIndex.foldRight(lit("und")) { case (((lang, _), i), els) =>
        val s = element_at(arr, i + 1)
        when(s > 0 && s === maxScore, lit(lang)).otherwise(els)
      }
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

  /** Corpus vocabulary: per-token corpus frequency (tf) and document
    * frequency (df), top-k by tf. The canonical word-count shape — partial
    * aggregation collapses each task's token stream locally, so the one
    * shuffle carries only distinct (token, partial-count) rows. df rides
    * the SAME aggregate as an exact distinct-doc count because the explode
    * emits each (doc, token) pair once per occurrence but tokens() output
    * feeds count_distinct(doc_id) — no second pass over the corpus. */
  /**
   * Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005): a d × w
   * counter grid over the md5 hash family estimates any term's frequency
   * as minⱼ counter[j][hⱼ(term)] — always an OVERestimate, within εN with
   * probability 1−δ for w = e/ε, d = ln(1/δ). Returns the exact top-k
   * terms with both their exact count and the sketch estimate, making the
   * overestimate property itself verifiable (est ≥ cnt).
   *
   * Plan shape: the token aggregate is the only corpus-sized shuffle (the
   * same one-shuffle word-count as [[vocabulary]]); the counter grid is
   * d·w rows built from it and every later join is broadcast-tiny. At
   * 100 TB the grid is what you SHIP (a few KB summarizes the corpus
   * frequency structure — mergeable across shards by addition), and the
   * md5 hash family means any engine can probe it.
   */
  def cmsHeavyHitters(
      docs: DataFrame,
      textCol: String,
      d: Int = 4,
      w: Int = 1024,
      k: Int = 20): DataFrame = {
    val words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    def bucket(word: Column, j: Column): Column =
      pmod(Dedup.md5Hash60(concat(j.cast("string"), lit(":"), word)),
        lit(w.toLong))
    val js = explode(typedLit((0 until d).toList)).as("j")
    val counters = words
      .select(col("word"), col("cnt"), js)
      .select(col("j"), bucket(col("word"), col("j")).as("b"), col("cnt"))
      .groupBy(col("j"), col("b")).agg(sum(col("cnt")).as("s"))
    val cand = words.orderBy(col("cnt").desc, col("word")).limit(k)
    cand
      .select(col("word"), col("cnt"), js)
      .withColumn("b", bucket(col("word"), col("j")))
      .join(counters, Seq("j", "b"))
      .groupBy(col("word"), col("cnt"))
      .agg(min(col("s")).as("cms_est"))
  }

  def vocabulary(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)

  /** Per-document corpus-unigram log-probability — the cheap stand-in for
    * LM-perplexity quality filtering (CCNet/Gopher-style): documents whose
    * tokens are improbable under the corpus unigram distribution score low
    * (gibberish), suspiciously high means boilerplate. Two shuffles of the
    * exploded token stream (by token to attach frequencies, back by doc to
    * aggregate); Catalyst broadcasts the vocabulary side automatically when
    * it fits — at 100 TB you'd pin a top-V vocab broadcast with an UNK
    * floor, same plan shape. Each token's log-prob is rounded to 9 places
    * and summed as DECIMAL so per-doc totals are exact and
    * order-independent — reproducible under any partitioning. */
  def unigramLogProb(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    // materialized once: both the per-token join side and the corpus total
    // read it (without the cut each consumer re-runs the explode+aggregate
    // over the corpus); unigram vocabularies are bounded far below corpus
    // scale, so the checkpoint is cheap even at 100 TB
    val vocab = graft.Materialize.localCheckpoint(
      toks.groupBy(col("token")).agg(count(lit(1)).as("cnt")))
    val total = vocab.agg(sum(col("cnt")).cast("double").as("total"))
    toks.join(vocab, "token")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log(col("cnt").cast("double") / col("total")), 9)
          .cast("decimal(20,9)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lp")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_logprob"))
  }

  /** Per-doc mean corpus-bigram CONDITIONAL log-probability
    * `ln(c(w1 w2) / c(w1 ·))` — the next-token-predictability quality
    * signal one rung above [[unigramLogProb]] (formulaic/templated text
    * scores high, shuffled-word noise scores low even when its unigrams
    * are common). Same scale shape as the unigram scorer: the corpus is
    * exploded ONCE; the bigram-count side is materialized and bounded far
    * below corpus scale; the context-count side derives from it without
    * touching the corpus again. Docs with fewer than two tokens carry no
    * bigram and are absent from the output. Token log-probs are rounded
    * to 9 places and summed as DECIMAL — exact under any fold order. */
  def bigramLogProb(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // native one-pass kernel: the declarative transform(sequence, i ->
    // element_at(toks, i)) chain re-tokenizes per element after
    // project-collapse — measured 10× slower at sf0.1
    val bg = graft.functions.GraftFunctions.word_ngrams(col(textCol), 2)
    val bgs = docs.select(col(idCol).as("doc_id"), explode(bg).as("bigram"))
    val counts = graft.Materialize.localCheckpoint(
      bgs.groupBy(col("bigram")).agg(count(lit(1)).as("c12")))
    val ctx = counts
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    bgs.join(counts, "bigram")
      .join(ctx, substring_index(col("bigram"), " ", 1) === col("w1"))
      .select(col("doc_id"),
        round(log(col("c12").cast("double") / col("c1").cast("double")), 9)
          .cast("decimal(20,9)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_logprob"))
  }

  /** Top-k PMI collocations — corpus-level multiword-expression mining
    * (Church–Hanks 1990 pointwise mutual information): bigrams whose joint
    * count beats the independence expectation, `ln(c12·N / (c1·c2))`,
    * restricted to `c12 >= minCount` so rare-pair noise (PMI's known
    * failure mode) is gated out. The signal a tokenizer-vocab builder or
    * phrase-normalizer runs over a corpus before training.
    *
    * Scale shape: the corpus is scanned twice (one unigram aggregate, one
    * bigram aggregate via the codegen'd `word_ngrams` kernel) and NEVER
    * shuffled as documents — both count frames are vocabulary-sized, all
    * joins happen between them, and the top-k is a TakeOrderedAndProject
    * (k rows to the driver merge, no global sort). Determinism: PMI is
    * computed from exact BIGINT products ratio'd in double, rounded to 6;
    * ordering ties break on the bigram itself. */
  def collocations(
      docs: DataFrame, textCol: String, idCol: String,
      minCount: Int, k: Int): DataFrame = {
    val uni = graft.Materialize.localCheckpoint(
      docs.select(explode(tokens(col(textCol))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("c")))
    val total = uni.agg(sum(col("c")).cast("long").as("n_total"))
    val big = docs.select(
        explode(graft.functions.GraftFunctions.word_ngrams(col(textCol), 2))
          .as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    big
      .join(uni.select(col("token").as("w1"), col("c").as("c1")),
        substring_index(col("bigram"), " ", 1) === col("w1"))
      .join(uni.select(col("token").as("w2"), col("c").as("c2")),
        substring_index(col("bigram"), " ", -1) === col("w2"))
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("c12"),
        round(log((col("c12") * col("n_total")).cast("double") /
          (col("c1") * col("c2")).cast("double")), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
  }

  /** DEFLATE compression ratio — the classic redundancy signal of the
    * Gopher/RefinedWeb quality family: repetitive or templated text
    * compresses far below natural prose, gibberish barely compresses at
    * all. Computed in a batched partition pass with ONE `Deflater`
    * instance reused per partition (the mapPartitions amortization
    * contract, same as the codec paths); level pinned so output length is
    * deterministic for a given zlib. Not SQL-replayable — the gate carries
    * the rows-only check, invariants are spec-verified. */
  def compressionRatio(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var comp = 0L
          while (!deflater.finished()) comp += deflater.deflate(buf)
          (id, raw.length.toLong, comp,
            math.floor(comp.toDouble / math.max(raw.length, 1) * 1e6) / 1e6)
        }
      }
      .toDF("doc_id", "raw_len", "comp_len", "ratio")
  }

  /** Hashed n-gram features (the "hashing trick", Weinberger et al. 2009):
    * each document's bigrams fold into a fixed `dim`-bucket space via the
    * md5-family hash — the fixed-width sparse representation fast linear
    * classifiers and DSIR-style importance models consume, with NO
    * vocabulary table to build, broadcast, or keep consistent across a
    * 100 TB corpus. Emitted long-form `(doc_id, idx, c)`; one aggregate
    * over the exploded n-gram stream, no joins at all. */
  def hashedFeatures(
      docs: DataFrame, textCol: String, idCol: String, dim: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.GraftFunctions.word_ngrams(col(textCol), 2))
          .as("bigram"))
      .groupBy(col("doc_id"),
        (Dedup.md5Hash60(col("bigram")) % dim).as("idx"))
      .agg(count(lit(1)).as("c"))

  /** Top-k TF-IDF terms per document — the standard keyword-extraction /
    * doc-representation signal (what a quality router or topic bucketing
    * step keys on). Plan shape: the corpus is exploded ONCE; per-(doc,term)
    * tf and per-term df come from two aggregates over that stream (the df
    * side is vocabulary-sized, so its join back broadcasts); the per-doc
    * top-k is a rank filter Spark rewrites to WindowGroupLimit — pruned
    * BELOW the exchange, so only k rows per doc reach the final shuffle.
    * Deterministic: score rounded to 6, ties break on the term itself. */
  def tfidfTopTerms(
      docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df").cast("double")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rnk"))
  }

  // ------------------------------------------------------------------- BPE

  /**
   * Train a BPE merge table from the corpus: ONE distributed word-count
   * (partial aggregation collapses each task's token stream before the
   * shuffle), a bounded top-`maxWords` pull (vocabularies are
   * corpus-scale-independent — the same bounded-driver-pull rationale as a
   * broadcast join's small side), then the classic merge loop on the
   * driver ([[graft.functions.Bpe.learnMerges]]). Deterministic: the word
   * table is ordered (count desc, word), merge ties break
   * lexicographically.
   */
  def bpeTrain(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 65536): Seq[(String, String)] = {
    val wordCounts = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    graft.functions.Bpe.learnMerges(wordCounts, numMerges)
  }

  /** Real-tokenizer `tokenCounter`: BPE piece count under `merges` — drops
    * into [[stats]], [[Curation.packDocuments]], [[Curation.quantileFilter]]
    * in place of [[subwordCount]]. One native codegen'd expression. */
  def bpeCount(merges: Seq[(String, String)])(text: Column): Column =
    graft.functions.GraftFunctions.bpe_count(text, merges)

  /** BPE pieces of a document in order (subword vocab building). */
  def bpePieces(merges: Seq[(String, String)])(text: Column): Column =
    graft.functions.GraftFunctions.bpe_pieces(text, merges)

  /**
   * Duplicated-n-gram character mass per document (the Gopher redundancy
   * family, Rae et al. 2021 §A1.1): of all word-n-gram instance characters
   * in a document, the ppm carried by grams occurring ≥ 2 times. The
   * hash-verifiable sibling of the zlib compression-ratio signal — exact
   * integer arithmetic end-to-end, so the oracle replays it bit-for-bit.
   *
   * Unlike the scalar [[Curation.repeatedNgramCharFrac]] (per-row list
   * scan — O(distinct·instances) per document), this is the corpus-scale
   * formulation: one explode + two keyed aggregates, so a pathological
   * 100 MB document costs O(grams) distributed work, not a quadratic
   * single-row kernel. Documents with fewer than `n` words carry no gram
   * instances and are excluded (no redundancy evidence either way).
   *
   * The gram-count shuffle is keyed on ([[Dedup.md5Hash60]](gram),
   * length(gram)), never the gram text — ~3× fewer shuffle bytes at
   * n-gram widths, and both engines hash identically so the (negligible,
   * within-document, 60-bit) collision behavior is mirrored exactly.
   */
  def dupNgramMass(
      docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol),
        explode(graft.functions.GraftFunctions.word_ngrams(col(textCol), n))
          .as("gram"))
      .select(col(idCol), Dedup.md5Hash60(col("gram")).as("h"),
        length(col("gram")).as("len"))
      .groupBy(col(idCol), col("h"), col("len"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_grams"),
        sum(when(col("c") >= 2, col("len") * col("c"))
          .otherwise(0L)).as("dup_chars"),
        sum(col("len") * col("c")).as("total_chars"))
      // dup_chars ≤ ~n× document length; ×1e6 stays under int64 up to
      // ~3 TB single documents — no wide decimal needed
      .select(col(idCol), col("n_grams"), col("dup_chars"), col("total_chars"),
        expr("dup_chars * 1000000 div total_chars").as("dup_ppm"))

  /** Boilerplate mining: word n-grams shared by more than `minDocs`
    * distinct documents (navigation chrome, license headers, template
    * text — the spans an exact-substring dedup pass would cut). Shingles
    * are distinct per document, so the count IS the doc frequency; one
    * hash-aggregate after the explode, top-k by spread. */
  def repeatedNgrams(
      docs: DataFrame, textCol: String, idCol: String,
      n: Int, minDocs: Long, k: Int): DataFrame =
    docs.select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(k)

  /**
   * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
   * the MOSS scheme): hash every k-char gram, slide a w-gram window, and
   * select each window's minimal hash, breaking ties by the RIGHTMOST
   * position (the paper's robust-winnowing rule). Guarantees every match
   * of length ≥ k+w−1 shares a fingerprint while keeping density ~2/(w+1).
   *
   * The select step packs (hash, position) into one lexicographic string
   * key — zero-padded lowercase hex + zero-padded (999999 − pos) — so the
   * rightmost-minimum rule is a plain `min` over a sliding row frame, an
   * aggregate both engines order identically (binary string compare).
   * Plan: one gram explode + one per-doc window + distinct — per-document
   * work only, embarrassingly parallel at 100 TB; no corpus-wide shuffle
   * beyond the doc-keyed window sort.
   */
  /**
   * Per-row winnowing fingerprint SET (`array<long>`): same scheme and
   * tie-break as [[winnowingFingerprints]] — k-char gram md5-60 hashes,
   * w-window minimum, rightmost tie win — as ONE native codegen'd kernel
   * ([[graft.functions.Sketches.winnowFpSet]]: monotonic-deque window
   * min, O(grams) total), so it runs on a STREAM, where the batch
   * formulation's per-document window sort is not allowed. The
   * declarative sequence/transform/slice/array_min form it replaced ran
   * O(grams·w) interpreted lambdas — measured 86 s for the sf0.1
   * stream_winnow corpus vs sub-second native. Documents shorter than
   * k+w−1 chars yield an empty array. Identical output to the batch
   * path, spec-checked.
   */
  def winnowFpSet(text: Column, k: Int, w: Int): Column =
    graft.functions.GraftFunctions.winnow_fp_set(text, k, w)

  def winnowingFingerprints(
      docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
    val grams = docs
      .filter(length(col(textCol)) >= k + w - 1)
      .select(col(idCol),
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("i"),
        col(textCol).as("t"))
      .select(col(idCol), col("i"),
        Dedup.md5Hash60(expr(s"substring(t, i, $k)")).as("h"))
    // position pad must cover the longest representable document: %09d
    // against base 999999999 stays 9 chars (and lexicographically ordered)
    // up to 1e9-char documents, where %06d/999999 went negative-and-7-wide
    // past ~1M chars and corrupted both the tie-break and the pos decode
    val packed = grams.select(col(idCol), col("i"),
      concat(format_string("%015x", col("h")),
        format_string("%09d", lit(999999999) - col("i"))).as("pk"))
    packed
      .withColumn("g", count(lit(1)).over(win.partitionBy(col(idCol))))
      .withColumn("mn", min(col("pk")).over(
        win.partitionBy(col(idCol)).orderBy(col("i"))
          .rowsBetween(win.currentRow, w - 1)))
      .filter(col("i") <= col("g") - (w - 1))
      .select(col(idCol), col("mn")).distinct()
      .select(col(idCol),
        expr("CAST(999999999 - CAST(substring(mn, 16, 9) AS BIGINT) AS BIGINT)").as("pos"),
        expr("CAST(conv(substring(mn, 1, 15), 16, 10) AS BIGINT)").as("fp"))
  }
}
