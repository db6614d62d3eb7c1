package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators a large-scale training-data pipeline needs
 * beyond dedup/similarity: train/test decontamination, intra-document
 * repetition signals (the Gopher-rule family), and temperature-based
 * domain mixture sampling. Everything is a declarative plan or a pure
 * column expression with an exact SQL mirror for the oracle.
 */
object Curation {

  // ------------------------------------------------------------ decontam

  /**
   * Train/test decontamination: for every train document, how many of its
   * distinct word n-grams appear in ANY test document — the standard
   * n-gram-overlap contamination check run before training (the "13-gram
   * overlap" family, here with configurable n).
   *
   * Plan shape at 100 TB: the test set's distinct n-grams are TINY next to
   * the train corpus (benchmarks are ~1e4–1e6 docs), so they broadcast —
   * the train side is one scan + explode + broadcast-hash-join + one
   * aggregation keyed by doc id; no shuffle of the train corpus at all.
   * With `broadcastTest = false` it degrades to a hash shuffle on the
   * n-gram — the right plan when the "test" side is itself huge.
   */
  def contamination(
      train: DataFrame,
      test: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      broadcastTest: Boolean = true): DataFrame = {
    val testGrams0 = test
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
      .withColumn("__hit", lit(1))
    val testGrams = if (broadcastTest) broadcast(testGrams0) else testGrams0
    // single shingle evaluation per train doc (shingling dominates the
    // cost — a size()+explode() two-step would re-derive it per row via
    // project collapse); n_grams falls out of the same count aggregation,
    // whose partial phase collapses each doc's exploded run locally before
    // any shuffle
    train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .join(testGrams, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hit"))
      .filter(col("n_hit") > 0)
      .withColumn("overlap",
        round(col("n_hit").cast("double") / col("n_grams").cast("double"), 6))
  }

  /**
   * [[contamination]] for the case where the test side is TOO BIG TO
   * BROADCAST: a Bloom filter of the test n-grams (fixed `numBits` bytes —
   * corpus-size-independent, unlike the gram set itself) prefilters the
   * exploded train stream BEFORE the gram shuffle, and a shuffled exact
   * join confirms the survivors. Bloom filters have no false negatives, so
   * the result is IDENTICAL to [[contamination]] — false positives cost
   * only a wasted probe row, removed by the confirm join. This is Spark's
   * own runtime-filter design ([[org.apache.spark.sql.catalyst.optimizer
   * .InjectRuntimeFilter]]) applied by hand where the optimizer can't see
   * it (the explode breaks its creation-side pattern).
   *
   * At 100 TB: per-doc totals come from a map-side partial aggregation of
   * the un-filtered gram stream (no join), while the expensive gram-keyed
   * shuffle moves only the bloom-surviving sliver of the corpus.
   */
  def contaminationBloom(
      train: DataFrame,
      test: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    import graft.functions.GraftFunctions.{bloom_agg, bloom_might_contain}
    val testGrams = test
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    // the sketch is numBits/8 bytes REGARDLESS of test-corpus size — pulling
    // it to the driver and re-literalizing is exactly what Spark's runtime
    // filters do across an exchange (might_contain requires a constant or
    // scalar-subquery build side)
    val bloomBytes = testGrams
      .agg(bloom_agg(col("gram"), expectedItems, numBits).as("__bloom"))
      .head().getAs[Array[Byte]]("__bloom")
    val grams = train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("gram"))
    val totals = grams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val confirmed = grams
      .filter(bloom_might_contain(lit(bloomBytes), col("gram")))
      .join(testGrams, Seq("gram")) // exact confirm: kills false positives
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    confirmed.join(totals, Seq(idCol))
      .withColumn("overlap",
        round(col("n_hit").cast("double") / col("n_grams").cast("double"), 6))
      .select(col(idCol), col("n_grams"), col("n_hit"), col("overlap"))
  }

  // ----------------------------------------------------------- repetition

  /** Evaluate `arr` ONCE per row and feed it to `body` through a lambda
    * variable — the let-binding the Column API lacks. Catalyst INLINES a
    * Column expression tree at every reference, and higher-order functions
    * re-evaluate their argument per element; a tokenize+n-gram input
    * referenced inside nested transform/filter lambdas therefore
    * re-tokenizes per comparison, turning O(g) kernels into
    * O(g² · tokenize) (measured: the repetition gate dropped ~100× with
    * this binding). `transform` over a one-element array evaluates the
    * element once and binds it. */
  private[operators] def bindOnce(arr: Column)(body: Column => Column): Column =
    element_at(transform(array(arr), body), 1)

  /** All word n-grams of a document IN ORDER (repeats kept — the counting
    * unit for repetition signals; distinct+sorted would erase them). */
  def ngramsAll(text: Column, n: Int): Column =
    bindOnce(TextAnalysis.tokens(text)) { words =>
      when(size(words) < n, array(concat_ws(" ", words)))
        .otherwise(transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))))
    }

  /** [[dupWordFrac]] over an already-bound token array — the one formula
    * both the standalone metric and the Gopher gate score with. */
  private def dupFracOfTokens(words: Column): Column =
    round((size(words) - size(array_distinct(words))).cast("double") /
      greatest(size(words), lit(1)).cast("double"), 6)

  /** Fraction of word occurrences beyond each word's first — 0 for a
    * document of all-distinct words, →1 as it degenerates to repetition. */
  def dupWordFrac(text: Column): Column =
    bindOnce(TextAnalysis.tokens(text))(dupFracOfTokens)

  /** The most frequent n-gram's share of the document's characters
    * (count × gram length / doc length) — the Gopher "top n-gram character
    * fraction" signal. Ties break to the lexicographically largest gram
    * (struct max on (count, gram)), so the value is deterministic.
    *
    * Per-document cost is O(distinct-grams × grams) inside codegen — fine
    * for natural documents (bounded length); a pipeline facing book-length
    * outliers should pre-truncate (`substring`) the signal input, which is
    * what production quality filters do anyway. */
  def topNgramCharFrac(text: Column, n: Int): Column =
    bindOnce(ngramsAll(text, n)) { grams =>
      val counts = transform(array_distinct(grams),
        g => struct(size(filter(grams, x => x === g)).as("c"), g.as("g")))
      val top = array_max(counts)
      round(when(length(text) === 0, lit(0.0)).otherwise(
        (top.getField("c") * length(top.getField("g"))).cast("double") /
          length(text).cast("double")), 6)
    }

  /** Character share of n-grams that occur more than once (each occurrence
    * counted) — the Gopher "duplicated n-gram character fraction" family. */
  def repeatedNgramCharFrac(text: Column, n: Int): Column =
    bindOnce(ngramsAll(text, n)) { grams =>
      val repeatedChars = aggregate(
        transform(array_distinct(grams),
          g => struct(size(filter(grams, x => x === g)).as("c"), g.as("g"))),
        lit(0L),
        (acc, s) => acc + when(s.getField("c") > 1,
          (s.getField("c") * length(s.getField("g"))).cast("long")).otherwise(0L))
      round(when(length(text) === 0, lit(0.0)).otherwise(
        repeatedChars.cast("double") / length(text).cast("double")), 6)
    }

  // -------------------------------------------------------------- packing

  /**
   * Sequence packing: assign documents to fixed-size training context
   * windows by greedy concatenation — documents are laid end-to-end in a
   * reproducible pseudo-random order (the content-hash shuffle every
   * training run needs anyway) and a document belongs to the window where
   * its first token lands.
   *
   * Scale shape: a single global running sum would be one sequential
   * window task, so the corpus is SHARDED by content hash first and packed
   * WITHIN each shard independently (how distributed packing is actually
   * run — each shard is a training data file); parallelism = `shards`,
   * memory = one running counter per task, and window ids are unique as
   * (shard, window). Everything is deterministic: same corpus ⇒ same
   * packing, any partitioning, any engine.
   */
  def packSequences(
      df: DataFrame,
      keyCol: String,
      nTokensCol: String,
      contextLen: Int,
      shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = Sampling.hashBucket(col(keyCol), shards).as("shard")
    val order = Dedup.md5Hash60(col(keyCol).cast("string"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(order.as("h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // keep the caller's columns (mask spans, labels) — they ride the same
    // shard shuffle; the window assignment itself reads only (key, tokens)
    df.withColumn("shard", shard)
      .withColumn("__cum", sum(col(nTokensCol)).over(w) - col(nTokensCol))
      .withColumn("window", floor(col("__cum") / contextLen))
      .drop("__cum")
  }

  /**
   * [[packSequences]] straight from raw text with a PLUGGABLE token
   * counter (default [[TextAnalysis.subwordCount]], the deterministic
   * BPE-ish estimate). A real tokenizer's count — a native expression or
   * UDF over the text column — drops in via `tokenCounter` without
   * touching the packing plan; the counter runs once per document inside
   * the same projection.
   */
  def packDocuments(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      contextLen: Int,
      shards: Int = 64,
      tokenCounter: Column => Column = TextAnalysis.subwordCount): DataFrame =
    packSequences(
      df.select(col(keyCol), tokenCounter(col(textCol)).as("n_tokens")),
      keyCol, "n_tokens", contextLen, shards)

  /**
   * SFT-style packing with LOSS MASKS: each document's first
   * `promptTokens` tokens (capped at its length) form the prompt span,
   * excluded from the loss; the remainder is the completion span. Packing
   * is [[packSequences]] unchanged — the mask counts ride the same shard
   * shuffle as extra integer columns, so the per-window loss-token density
   * (what an SFT dataloader actually schedules by) folds into the same
   * (shard, window) aggregate as the token counts, at zero extra shuffles.
   * Output: (key, n_tokens, n_prompt, n_loss, shard, window).
   */
  def packWithLossMask(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      contextLen: Int,
      promptTokens: Int,
      shards: Int = 64,
      tokenCounter: Column => Column = TextAnalysis.subwordCount): DataFrame =
    packSequences(
      df.select(col(keyCol), tokenCounter(col(textCol)).as("n_tokens"))
        .withColumn("n_prompt", least(col("n_tokens"), lit(promptTokens.toLong)))
        .withColumn("n_loss", col("n_tokens") - col("n_prompt")),
      keyCol, "n_tokens", contextLen, shards)

  /**
   * Corpus-relative quantile gating: keep documents whose score is at or
   * above the corpus `quantile` (e.g. 0.2 drops the bottom 20%). The
   * scorer is pluggable (default [[TextAnalysis.qualityScore]] — any
   * Column expression, incl. a model-based score or a token-count
   * heuristic, drops in). The threshold is ONE exact-percentile aggregate
   * (a single scalar) broadcast back over a second scan — the corpus
   * itself never shuffles. Output = input columns + (score, threshold).
   */
  def quantileFilter(
      df: DataFrame,
      textCol: String,
      quantile: Double,
      scorer: Column => Column = TextAnalysis.qualityScore): DataFrame = {
    val scored = df.withColumn("score", scorer(col(textCol)))
    val th = scored.agg(percentile(col("score"), lit(quantile)).as("threshold"))
    scored.crossJoin(broadcast(th)).filter(col("score") >= col("threshold"))
  }

  /**
   * Per-domain frequency cap: keep at most `maxPerDomain` documents per
   * domain, best-first — the standard web-pipeline guard against a single
   * host flooding the corpus (C4/RefinedWeb-style "docs per domain" caps).
   * Ranking is (score desc, id) so the cut is deterministic; output keeps
   * the rank as `rnk`.
   *
   * Scale shape: ONE shuffle keyed by domain. The `row_number ≤ cap`
   * filter is rewritten by Spark to WindowGroupLimit, which prunes each
   * task's groups to their top `maxPerDomain` BEFORE the exchange — a
   * mega-domain ships cap-bounded rows per task, not its full volume.
   */
  def domainCap(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      scoreCol: Column,
      maxPerDomain: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol))
      .orderBy(scoreCol.desc, col(idCol))
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= maxPerDomain)
  }

  // -------------------------------------------------------------- mixture

  /**
   * Temperature-scaled domain mixture rates: given per-domain document
   * counts, the sampling rate per domain such that the kept corpus follows
   * the α-temperature distribution `share_d ∝ (n_d/N)^α` at the largest
   * feasible size (the domain that saturates at rate 1.0 pins the scale) —
   * the standard multi-source mixing rule for training corpora (α<1 upweights
   * small domains).
   *
   * All double arithmetic happens in SORTED domain order with IEEE ops only
   * (sqrt/div/mul/add), so an external system — or the DuckDB oracle —
   * reproduces the rates bit-for-bit.
   */
  def temperatureRates(
      counts: Seq[(String, Long)], alpha: Double): Seq[(String, Double)] = {
    val sorted = counts.sortBy(_._1)
    val total = sorted.map(_._2).sum.toDouble
    // α=0.5 goes through IEEE sqrt (correctly rounded ⇒ bit-identical in
    // any engine); other α through pow (typically ≤1 ulp, close enough for
    // rates but not guaranteed portable)
    val weights = sorted.map { case (d, c) =>
      val p = c.toDouble / total
      d -> (if (alpha == 0.5) math.sqrt(p) else math.pow(p, alpha))
    }
    val z = weights.map(_._2).foldLeft(0.0)(_ + _) // fixed order
    // K = min over domains of n_d / share_d; rate_d = share_d * K / n_d
    val k = weights.map { case (d, w) =>
      val share = w / z
      sorted.toMap.apply(d).toDouble / share
    }.min
    weights.map { case (d, w) =>
      val share = w / z
      val nd = sorted.toMap.apply(d).toDouble
      d -> math.min(1.0, share * k / nd)
    }
  }

  /**
   * Deterministic mixture sample: keep a document iff its content-hash
   * bucket (of 10.000) falls under its domain's temperature rate. One
   * count-aggregation (collected — domains are few), then a pure filter:
   * membership is a function of (key, domain rates) only, reproducible
   * anywhere, stable under repartitioning.
   */
  def mixtureSample(
      df: DataFrame,
      domainCol: String,
      keyCol: String,
      alpha: Double): DataFrame =
    mixtureSampleBy(df, domainCol, keyCol, alpha, lit(1L))

  /**
   * [[mixtureSample]] with domain sizes measured by an arbitrary WEIGHT
   * column — most usefully a token count, the "mix by token budget" knob
   * every multi-source training corpus actually tunes (a domain of few
   * huge documents should count by its tokens, not its doc count). Same
   * bit-reproducible rate arithmetic over the weighted totals, same
   * content-hash membership; one weighted count-aggregation (collected —
   * domains are few) then a pure filter.
   */
  def mixtureSampleBy(
      df: DataFrame,
      domainCol: String,
      keyCol: String,
      alpha: Double,
      weight: Column): DataFrame = {
    val counts = df.groupBy(col(domainCol)).agg(sum(weight).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val rates = temperatureRates(counts, alpha)
    // integer threshold of 10k buckets: round once, compare in integers
    val thresholds = rates.map { case (d, r) =>
      d -> math.floor(r * 10000.0 + 0.5).toLong
    }
    val thMap = map(thresholds.flatMap { case (d, t) => Seq(lit(d), lit(t)) }: _*)
    df.filter(Sampling.hashBucket(col(keyCol), 10000) <
      element_at(thMap, col(domainCol)))
  }

  /**
   * Composite Gopher-style quality gate (Rae et al. 2021, "Scaling
   * Language Models" §A1.1 rule family): word-count bounds, mean-word-
   * length bounds, duplicate-word fraction, and minimum distinct-stopword
   * presence, evaluated in one pass with a machine-auditable `reasons`
   * column (comma-joined names of the failed rules, fixed order) — the
   * shape a real curation pipeline logs so drops are attributable. Pure
   * codegen'd column expressions over each document; no shuffle, no UDF.
   */
  def gopherFilter(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minWords: Int = 20,
      maxWords: Int = 1000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      maxDupFrac: Double = 0.6,
      minStopwords: Int = 2): DataFrame = {
    // every rule reads the SAME token array — bound once per row (a bare
    // `tokens(text)` reference per rule would re-tokenize ~9x: size,
    // mean-length aggregate, dup fraction, 6 stopword containment probes)
    val sig = bindOnce(TextAnalysis.tokens(col(textCol))) { words =>
      val n = size(words).cast("long")
      val meanLen = when(n > 0,
        aggregate(words, lit(0L), (a, w) => a + length(w)).cast("double") /
          n.cast("double")).otherwise(lit(0.0))
      val dup = dupFracOfTokens(words)
      val stops = size(filter(
        typedLit(Seq("the", "a", "of", "to", "and", "in")),
        s => array_contains(words, s)))
      val checks: Seq[(String, Column)] = Seq(
        "dup_words" -> (dup > maxDupFrac),
        "mean_word_len" -> (meanLen < minMeanLen || meanLen > maxMeanLen),
        "stopwords" -> (stops < minStopwords),
        "too_long" -> (n > maxWords),
        "too_short" -> (n < minWords))
      val reasonArr = array(checks.map { case (nm, fail) =>
        when(fail, lit(nm)).otherwise(lit(null).cast("string"))
      }: _*)
      struct(n.as("n"),
        array_join(filter(reasonArr, x => x.isNotNull), ",").as("reasons"))
    }
    df.select(col(idCol), sig.getField("n").as("n_words"),
        sig.getField("reasons").as("reasons"))
      .withColumn("keep", col("reasons") === "")
      .select(col(idCol), col("n_words"), col("keep"), col("reasons"))
  }

  // ------------------------------------------------------------- chunking

  /**
   * Overlapping word-window chunking — the context-window preparation step
   * of RAG / long-context training pipelines: each document becomes
   * `ceil(max(0, n − chunkSize) / stride) + 1` chunks of up to `chunkSize`
   * words, adjacent chunks sharing `overlap` words (stride = chunkSize −
   * overlap). Output: (id, chunk_id, chunk_text, n_words), chunk ids dense
   * from 0 in document order; the tail chunk is never empty (its start is
   * always ≤ n), and word-empty documents yield no chunks.
   *
   * Plan shape: split → sequence → explode → slice, all narrow codegen'd
   * column expressions — zero shuffle, so at 100 TB the cost is the scan
   * plus the ~chunkSize/stride output amplification, which is the floor
   * for this operator.
   */
  def chunkDocuments(
      df: DataFrame,
      textCol: String,
      idCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val start = (col("chunk_id") * stride + 1).cast("int")
    df.select(col(idCol),
        filter(split(col(textCol), "\\s+"), w => length(w) > 0).as("__w"))
      .withColumn("__n", size(col("__w")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__w"),
        // last chunk index: ceil(max(0, n - chunkSize) / stride)
        explode(sequence(lit(0L),
          ceil(greatest(col("__n") - chunkSize, lit(0)).cast("double") / stride)
            .cast("long"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__w"), start, lit(chunkSize)), " ").as("chunk_text"),
        size(slice(col("__w"), start, lit(chunkSize))).cast("long").as("n_words"))
  }

  // ------------------------------------------------------------- DSIR

  /**
   * DSIR-style importance weighting (Xie et al., "Data Selection for
   * Language Models via Importance Resampling", 2023): score every doc by
   * how much more likely its hashed-n-gram features are under the TARGET
   * domain's unigram feature model than under the raw corpus's — the
   * standard way to select in-domain training data from a web-scale pool.
   * log w(x) = Σ_f∈x [ln p̂_target(f) − ln p̂_source(f)] with add-1
   * smoothing over `buckets` hashed features.
   *
   * Determinism device: each bucket's log-ratio is rounded once onto a
   * 1e-6 grid and summed as BIGINT, so a doc's log-weight is independent
   * of aggregation order (same device as the centroid/PageRank sums).
   *
   * Plan shape at 100 TB: two feature-count aggregates over the token
   * stream (target side filters the same scan), then the corpus joins a
   * ≤`buckets`-row log-ratio table — explicitly broadcast — and
   * aggregates once keyed by doc. The corpus shuffles exactly once (the
   * per-doc sum); the model is a few KB that ships to every executor.
   */
  def dsirLogWeights(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      isTarget: Column,
      buckets: Int = 4096): DataFrame = {
    val feats = docs
      .select(col(idCol).as("doc_id"), isTarget.as("tgt"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .select(col("doc_id"), col("tgt"),
        pmod(Dedup.md5Hash60(col("w")), lit(buckets.toLong)).as("b"))
    val srcCnt = feats.groupBy(col("b")).agg(count(lit(1)).as("scnt"))
    val tgtCnt = feats.filter(col("tgt")).groupBy(col("b")).agg(count(lit(1)).as("tcnt"))
    // two bounded scalar pulls (total token counts) — reused as literals
    val sTot = feats.count()
    val tTot = feats.filter(col("tgt")).count()
    val lr = srcCnt.join(tgtCnt, Seq("b"), "left").select(col("b"),
      round(
        (log((coalesce(col("tcnt"), lit(0L)) + lit(1.0)) / lit((tTot + buckets).toDouble)) -
          log((col("scnt") + lit(1.0)) / lit((sTot + buckets).toDouble))) * lit(1000000.0),
        0).cast("long").as("qlr"))
    feats.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("qlr")).as("qsum"), count(lit(1)).as("n_feats"))
  }

  /**
   * Deterministic weighted interleave — the FIXED MIXING SCHEDULE that
   * serializes a multi-source corpus into one training order (the step
   * after [[mixtureSample]] decides rates: a source with weight w
   * contributes every position where its stride `(rn−1)·L/w` is due, L =
   * lcm of the weights, ties by source name). Pure arithmetic on exact
   * integers: any two engines produce the identical order, which is the
   * property a reproducible-training-run manifest needs.
   *
   * Plan shape: ONE shuffle (per-source row_number), then a global
   * TakeOrderedAndProject for the `take`-row prefix — k rows to the
   * driver merge, never a global sort; the final position window runs on
   * the bounded prefix only. At 100 TB the schedule is written
   * range-partitioned by key instead of prefixed — same two stages.
   */
  def interleaveSchedule(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      weight: Column, // integer weights; key stride uses lcm 6 (w ∈ 1..3)
      take: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wrn = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
    val keyed = docs
      .select(col(idCol), col(sourceCol), weight.as("wt"))
      .withColumn("rn", row_number().over(wrn))
      .withColumn("key", (col("rn") - 1) * expr("6 div wt"))
    val prefix = keyed.orderBy(col("key"), col(sourceCol), col("rn")).limit(take)
    prefix
      .withColumn("pos",
        row_number().over(Window.orderBy(col("key"), col(sourceCol), col("rn"))))
      .select(col("pos"), col(sourceCol), col(idCol))
  }
}
