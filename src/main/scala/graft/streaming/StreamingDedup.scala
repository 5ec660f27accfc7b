package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * Streaming exact dedup over a document stream (north-star extension;
 * the batch counterpart is [[graft.dedup.Dedup.exactDedup]]): the
 * first document carrying a normalized fingerprint passes, later
 * copies are dropped. Built on `dropDuplicatesWithinWatermark`, so the
 * per-key state store entry expires once the watermark passes its
 * event time — bounded state, which is the property that makes
 * streaming dedup survive an unbounded corpus feed (a plain
 * `dropDuplicates` keeps every fingerprint forever).
 *
 * Scale posture: state is keyed by the 32-char fingerprint (never the
 * document body), partitioned by the state-store hash — the same
 * "shuffle the digest, not the text" rule as the batch path. The
 * dedup window equals the watermark delay: two copies farther apart
 * than the delay can both pass (cross-window dedup is the batch
 * job's responsibility in a lambda layout).
 */
object StreamingDedup {

  /** `docs` must carry (doc_id, ts, text) with `ts` the event-time
    * column. Emits the surviving documents with their fingerprint. */
  def exactDedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("fingerprint", call_function("graft_norm_fp", col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")
  }

  /** Static MinHash-LSH index over a reference corpus, for
    * stream-side matching: one row per (band_idx, bucket) posting with
    * the doc's hashed shingle set for exact verification. Build once,
    * persist/broadcast; the streaming side never scans the corpus. */
  def minhashIndex(corpus: DataFrame, k: Int = 12, bands: Int = 4, rows: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val digs = corpus
      .select(col("doc_id").as("corpus_doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(3)).as("digs"))
      .where(size(col("digs")) > 0)
    digs
      .select(col("corpus_doc_id"),
        array_sort(array_distinct(col("digs"))).as("corpus_hset"),
        graft.dedup.Dedup.lshBands(
          call_function("graft_minhash", col("digs"), lit(k)), bands, rows).as("bands"))
      .select(col("corpus_doc_id"), col("corpus_hset"),
        posexplode(col("bands")).as(Seq("band_idx", "bucket")))
  }

  /**
   * Streaming near-dup detection against a STATIC corpus index (the
   * lambda layout: the batch job owns corpus×corpus dedup; the stream
   * flags arriving docs against the frozen index). Stateless per row
   * until the final within-watermark pair dedup: signature/banding are
   * native one-pass kernels, candidates come from a stream-static
   * equi-join on (band_idx, bucket) — broadcastable when the index is
   * small, shuffle-partitioned otherwise — and verification is the
   * exact hashed-shingle Jaccard. A pair colliding in several bands is
   * emitted once per watermark window.
   */
  def streamingNearDups(
      docs: DataFrame,
      index: DataFrame,
      threshold: Double = 0.6,
      k: Int = 12, bands: Int = 4, rows: Int = 3,
      watermarkDelay: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val digs = docs
      .select(col("doc_id"), col("ts"),
        call_function("graft_shingle_hashes", col("text"), lit(3)).as("digs"))
      .where(size(col("digs")) > 0)
    val banded = digs
      .select(col("doc_id"), col("ts"),
        array_sort(array_distinct(col("digs"))).as("hset"),
        posexplode(graft.dedup.Dedup.lshBands(
          call_function("graft_minhash", col("digs"), lit(k)), bands, rows))
          .as(Seq("band_idx", "bucket")))
    banded
      .join(index, Seq("band_idx", "bucket"))
      .where(col("doc_id") =!= col("corpus_doc_id"))
      .withColumn("jaccard",
        round(graft.dedup.Dedup.jaccardHashed(col("hset"), col("corpus_hset")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("doc_id"), col("ts"), col("corpus_doc_id"), col("jaccard"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_doc_id")
  }

  /**
   * Streaming decontamination: flag arriving documents that share
   * word n-grams with a STATIC benchmark set — the continuous twin of
   * [[graft.dedup.Dedup.decontaminate]]. The benchmark's distinct
   * gram hashes are collected once and broadcast as a lookup set;
   * each micro-batch row counts its hits per row. STATELESS (append
   * mode, no watermark, no state store): a doc's grams never span
   * rows, so no aggregation crosses a batch boundary.
   *
   * Driver state is the benchmark gram set — bounded like the k-means
   * centroids (every public eval suite together is ≪ 10^8 grams ≈
   * 800 MB at the extreme; typical suites are orders smaller). A
   * corpus-sized benchmark should run the batch operator per
   * micro-batch via foreachBatch instead.
   */
  /**
   * Streaming substring-duplication screen against a STATIC reference
   * corpus — the continuous twin of
   * [[graft.dedup.Dedup.substringDedup]] in the lambda layout: the
   * batch job owns corpus×corpus substring dedup; the stream scores
   * each ARRIVING doc's l-token spans against the frozen corpus gram
   * set (one corpus occurrence plus the arriving one is already a
   * duplicated span, so membership IS the `occ >= 2` predicate).
   * Same per-doc output shape and arithmetic as the batch operator:
   * merged-interval coverage over dup starts, ROUND(,6) fraction,
   * `keep = dup_frac <= maxDupFrac`. Batch-equivalence on a replayed
   * corpus is spec-tested (StreamingSpec): for arriving docs with no
   * stream-internal duplication, row-for-row equal to
   * `substringDedup(corpus ∪ stream)` restricted to the stream slice.
   * Stream-internal duplicates are the batch job's responsibility —
   * the same caveat as [[streamingNearDups]].
   *
   * STATELESS (append mode, no state store): a doc's grams never span
   * rows, so the interval merge runs row-locally over the native
   * 63-bit gram-hash array. Driver/broadcast state is the corpus's
   * distinct gram set — the [[streamingDecontaminate]] boundedness
   * argument (8 bytes per distinct gram; reference sets in the 10^8
   * range fit, a corpus-scale reference should run the batch operator
   * per micro-batch via foreachBatch instead).
   */
  /** The static reference's distinct gram hashes at or below this
    * count may be collected to the driver and broadcast (8 B/gram →
    * 10^8 ≈ 800 MB, the documented extreme for public benchmark
    * suites). LOUD BOUND, same shape as
    * [[graft.dedup.Dedup.maxDriverFoldEdges]]: above it the collect
    * REFUSES with the foreachBatch alternative named, instead of
    * silently OOMing the driver on a corpus-sized reference. */
  val maxDriverGramSet: Long = 100000000L

  /** Count-and-refuse collect of a distinct LONG gram column — the
    * shared guard for [[streamingSubstringScreen]] /
    * [[streamingDecontaminate]]'s driver-side reference state. The
    * count is one cheap aggregate job over the (already distinct)
    * frame; the alternative to refusing here is an un-diagnosable
    * driver OOM mid-collect. */
  private def collectGramSet(
      grams: DataFrame, op: String, maxGrams: Long): Set[Long] = {
    val spark = grams.sparkSession
    import spark.implicits._
    val n = grams.count()
    require(n <= maxGrams,
      s"$op: static reference has $n distinct grams > maxDriverGramSet=" +
        s"$maxGrams — too large to broadcast as driver state; run the " +
        "batch operator per micro-batch via foreachBatch instead " +
        "(graft.dedup.Dedup.substringDedup / decontaminate)")
    grams.as[Long].collect().toSet
  }

  def streamingSubstringScreen(
      docs: DataFrame, corpus: DataFrame, l: Int = 5,
      maxDupFrac: Double = 0.5, maxGrams: Long = maxDriverGramSet): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val gramSet: Set[Long] = collectGramSet(
      corpus.select(explode(array_distinct(
        call_function("graft_shingle_hashes63", col("text"), lit(l)))).as("g"))
        .distinct(),
      "streamingSubstringScreen", maxGrams)
    val bc = spark.sparkContext.broadcast(gramSet)
    docs
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        call_function("graft_shingle_hashes63", col("text"), lit(l)).as("gs"))
      .as[(Long, Long, Seq[Long])]
      .map { case (id, nTokens, gs) =>
        // row-local twin of the batch running-max-end interval merge:
        // windows share length l, so each dup start extends coverage
        // by (p + l) - max(p, running end)
        var dupStarts = 0L
        var covered = 0L
        var end = Long.MinValue
        var p = 0
        while (p < gs.length) {
          if (bc.value.contains(gs(p))) {
            dupStarts += 1
            val e = p.toLong + l
            if (e > end) {
              covered += e - math.max(p.toLong, end)
              end = e
            }
          }
          p += 1
        }
        val frac =
          if (nTokens == 0) 0.0
          else BigDecimal(covered.toDouble / nTokens)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, nTokens, gs.length.toLong, dupStarts, covered, frac,
          frac <= maxDupFrac)
      }
      .toDF("doc_id", "n_tokens", "n_grams", "dup_starts",
        "covered_tokens", "dup_frac", "keep")
  }

  def streamingDecontaminate(
      docs: DataFrame, benchmark: DataFrame,
      n: Int = 3, minHits: Long = 1L,
      maxGrams: Long = maxDriverGramSet): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val benchSet: Set[Long] = collectGramSet(
      benchmark.select(explode(array_distinct(
        call_function("graft_shingle_hashes", col("text"), lit(n)))).as("g"))
        .distinct(),
      "streamingDecontaminate", maxGrams)
    val bc = spark.sparkContext.broadcast(benchSet)
    docs
      .select(col("doc_id"),
        array_distinct(call_function("graft_shingle_hashes", col("text"), lit(n)))
          .as("grams"))
      .as[(Long, Seq[Long])]
      .map { case (id, grams) => (id, grams.count(bc.value.contains).toLong) }
      .toDF("doc_id", "n_hits")
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /**
   * Streaming BLOOM contamination screen — [[streamingDecontaminate]]
   * with the driver/plan state shrunk from the full gram set (8 B +
   * ~40 B JVM-set overhead per gram) to the Bloom bitset
   * (`bitsPerGram`/8 bytes per gram, ~30× smaller), the state a
   * benchmark too large for [[maxDriverGramSet]] still fits. The
   * trade is one-sided: ZERO false negatives (an unflagged doc is
   * definitively clean — the common case on a mostly-clean ingest,
   * which this screen passes through untouched), while `n_bloom_hits`
   * is an fpp-bounded UPPER bound on the true hit count — a flagged
   * doc routes to the exact confirm
   * ([[graft.dedup.Dedup.bloomDecontaminate]] in a foreachBatch, or
   * the batch layer), exactly the triage split production ingest
   * gates run. Output (doc_id, n_bloom_hits, maybe_contaminated).
   *
   * STATELESS append projection (no state store, no watermark): the
   * bitset rides the plan as one reference object via the shared
   * [[graft.functions.BloomContains]] expression, and both this
   * screen and the batch operator probe the IDENTICAL bitset
   * ([[graft.dedup.Dedup.buildBloomWords]] — one build path, so the
   * two layers can never disagree on membership).
   */
  def streamingBloomScreen(
      docs: DataFrame, benchmark: DataFrame,
      n: Int = 3, minHits: Long = 1L, bitsPerGram: Int = 12,
      maxBloomWords: Long = 1L << 27): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // barrier: buildBloomWords runs a count job AND the bit_or
    // aggregate over this frame — without it the benchmark's
    // shingle/explode/distinct chain executes twice (the batch
    // operator materializes for the same reason)
    val bench = graft.Materialize.barrier(
      benchmark.select(explode(array_distinct(
          call_function("graft_shingle_hashes", col("text"), lit(n)))).as("g"))
        .distinct())
    val (words, k) = graft.dedup.Dedup.buildBloomWords(
      bench, bitsPerGram, maxBloomWords, "streamingBloomScreen")
    docs
      .select(col("doc_id"),
        array_distinct(call_function("graft_shingle_hashes", col("text"), lit(n)))
          .as("grams"))
      .select(col("doc_id"),
        size(filter(col("grams"), g =>
          call_function("graft_bloom_contains", g, typedlit(words.toSeq), lit(k))))
          .cast("long").as("n_bloom_hits"))
      .withColumn("maybe_contaminated", col("n_bloom_hits") >= minHits)
  }
}
