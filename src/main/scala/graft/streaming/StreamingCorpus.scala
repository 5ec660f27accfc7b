package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-prep operators under streaming ingestion. Mixture sampling
 * is the interesting one to get right: the BATCH mixture operators
 * ([[graft.queries.CorpusQueries.mx1DomainMixture]]/mx2) derive their
 * per-domain rates from a corpus-wide aggregate, which a stream
 * cannot recompute per row without unbounded state — so the streaming
 * form splits the two halves along their natural state boundary:
 *
 *  - RATES are computed batch-side on a reference snapshot (or the
 *    previous day's corpus) and arrive here as a static frame,
 *    exactly like the static minhash index
 *    [[StreamingDedup.streamingNearDups]] joins against;
 *  - MEMBERSHIP is a pure function of (doc_id, rate): hash(doc_id)
 *    mod 10000 < rate_bp — the same hash as the batch path, so a
 *    document admitted by the stream is EXACTLY the document the
 *    batch job would have kept. No state, no watermark; a broadcast
 *    hash join against the domain-cardinality rate table and a
 *    stateless filter that fuse into each micro-batch's scan.
 *
 * Rates drift as the corpus grows; refreshing them is a restart with
 * a new static frame (the deterministic hash means re-admission
 * decisions only change where the RATE changed, never arbitrarily).
 */
object StreamingCorpus {

  /** Streaming classifier-curation screen — the continuous twin of
    * the cu3 gate key: the native `graft_quality_score` projection
    * (hashed unigram+n-gram features × one reference-object weight
    * vector) applied to each ARRIVING document. STATELESS append
    * (pure codegen'd projection — no state store, no watermark, no
    * driver collect): the weight vector is plan state, identical to
    * the batch key's, so batch-equivalence is structural and
    * spec-asserted on a replayed corpus (StreamingSpec). The shape a
    * 100 TB/day ingest quality-gate actually wants: per-row cost is
    * one kernel call, nothing accumulates. */
  def streamingQualityScreen(
      docs: DataFrame, weights: Array[Double], bias: Double = 0.0,
      ngrams: Int = 2,
      keepThreshold: Double =
        graft.queries.PipelineQueries.QualityKeepThreshold): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"),
        call_function("graft_quality_score", col("text"),
          typedlit(weights), lit(bias), lit(ngrams)).as("logit6"))
      .withColumn("keep",
        coalesce(col("logit6") >= keepThreshold, lit(false)))
  }

  /** (doc_id, source, ...) stream × (source, rate_bp) static table →
    * the sampled stream, with the bucket exposed for auditability.
    *
    * A domain ABSENT from the rates table means the snapshot predates
    * it — there is no correct rate to apply, so the default policy is
    * to FAIL the batch (fail-loudly: restart with refreshed rates)
    * rather than silently drop or blindly admit a whole domain.
    * `onUnknown`: "fail" (default), "keep" (admit unrated domains
    * wholesale — rate 10000), or "drop" (exclude them). */
  def mixtureSample(
      docs: DataFrame, rates: DataFrame, onUnknown: String = "fail"): DataFrame = {
    require(Set("fail", "keep", "drop")(onUnknown),
      s"onUnknown must be fail|keep|drop: $onUnknown")
    val rate = onUnknown match {
      case "fail" => coalesce(col("rate_bp"),
        raise_error(concat(lit("mixtureSample: no rate for domain '"),
          col("source"), lit("' — refresh the rates snapshot"))))
      case "keep" => coalesce(col("rate_bp"), lit(10000L))
      case "drop" => coalesce(col("rate_bp"), lit(0L))
    }
    docs
      .join(broadcast(rates.select(col("source"), col("rate_bp"))), Seq("source"), "left")
      .withColumn("bucket", graft.queries.CorpusQueries.idHash(col("doc_id")) % 10000)
      .where(col("bucket") < rate)
      .drop("rate_bp")
  }

  /**
   * Streaming DSIR importance screen — the continuous twin of
   * [[graft.queries.CorpusQueries.dsirSelect]] split along the same
   * state boundary as [[mixtureSample]]: the importance log-ratio
   * table λ is estimated batch-side from a STATIC reference corpus
   * (via the SAME `dsirLambda` code path the batch operator uses) and
   * frozen; each arriving doc is scored stateless per row — hashed
   * word bigrams, per-bucket counts, the b-ASCENDING ordered fold
   * Σ n·λ(b), mean, ROUND(,6) — reproducing the batch arithmetic
   * exactly. Batch equivalence is spec-tested: replaying the
   * reference corpus through the stream yields row-for-row the batch
   * operator's (n_feats, w_mean) for every doc.
   *
   * Semantics note (mirrors the batch inner join): a bigram bucket
   * the reference corpus never produced has no λ row, so it
   * contributes to NEITHER the weight NOR n_feats — exactly what
   * `perDoc ⋈ lam` does batch-side. Docs with no bigrams (< 2
   * tokens) emit nothing, as batch-side (the explode produces no
   * feature rows).
   *
   * Driver/broadcast state is the λ map — AT MOST `buckets` entries
   * (256 by default): the smallest static state of any screen here.
   * Top-k selection is inherently batch (a stream has no "final"
   * ranking); the screen emits the per-doc scores and the caller
   * thresholds or windows them.
   */
  def streamingDsirScreen(
      docs: DataFrame, corpus: DataFrame,
      isTarget: org.apache.spark.sql.Column,
      buckets: Int = 256, heldOutRaw: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val Q = graft.queries.CorpusQueries
    val lamMap: Map[Long, Double] = Q.dsirLambda(
        Q.dsirFeatures(corpus, isTarget, buckets), buckets, heldOutRaw)
      .select(col("b").cast("long"), col("lam"))
      .as[(Long, Double)].collect().toMap
    val bc = spark.sparkContext.broadcast(lamMap)
    docs
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text"), lit(2)).as("gs"))
      .as[(Long, Seq[Long])]
      .flatMap { case (id, gs) =>
        if (gs.isEmpty) None
        else {
          // per-bucket counts, folded in ascending-b order — the same
          // term sequence as the batch ordered fold
          val counts = scala.collection.mutable.SortedMap.empty[Long, Long]
          gs.foreach { g =>
            val b = g % buckets
            if (bc.value.contains(b)) counts(b) = counts.getOrElse(b, 0L) + 1L
          }
          if (counts.isEmpty) None
          else {
            var w = 0.0
            var n = 0L
            counts.foreach { case (b, c) => w += c * bc.value(b); n += c }
            val wMean = BigDecimal(w / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            Some((id, n, wMean))
          }
        }
      }
      .toDF("doc_id", "n_feats", "w_mean")
  }

  final case class NoveltyState(words: Array[Long])

  /** Bloom bitset words per gram-bit budget — the loud bound shared
    * with the dedup builders (1 << 27 words = 1 GiB of state-store
    * entry; past it the state no longer fits a sane per-key budget). */
  val maxNoveltyWords: Long = 1L << 27

  /**
   * Streaming n-gram NOVELTY — the continuous, BOUNDED-STATE twin of
   * the ng1 batch key ("is this crawl still adding anything"): per
   * arriving document, the fraction of its distinct n-gram hashes
   * never seen in any earlier document of the stream.
   *
   * The exact cumulative definition needs the set of ALL grams ever
   * seen — unbounded state no stream can carry. This twin bounds it
   * with a Bloom bitset ([[graft.functions.BloomKernel]] — the same
   * position kernel as the bf1 screen, one membership arithmetic
   * repo-wide): `expectedGrams × bitsPerGram` bits TOTAL, forever,
   * regardless of corpus size. The approximation direction is
   * ONE-SIDED: a Bloom filter has no false negatives, so a seen gram
   * is always reported seen — novelty is never over-counted;
   * `n_novel` is an UNDER-count (a truly-novel gram can collide with
   * set bits) with per-gram miss probability ≈ the filter's fpp at
   * its current fill — (1 − e^(−k·n/m))^k, ≈ 0.0003 at the default
   * 12 bits/gram while n ≤ expectedGrams. So:
   * `n_novel_stream ∈ [n_novel_batch · (1 − fpp), n_novel_batch]` in
   * expectation, and the spec (StreamingSpec) asserts the hard ≤
   * direction per doc plus exact equality on the replayed fixture
   * (deterministic positions → deterministic result).
   *
   * Sequential semantics, made explicit: cumulative novelty is
   * order-DEPENDENT (the batch key resolves ties by doc_id), so the
   * fold runs as ONE `flatMapGroupsWithState` group — per-batch
   * arrivals are sorted by doc_id, matching the batch min(doc_id)
   * first-holder rule on a replayed corpus. The per-doc gram hashing
   * (the actual CPU) stays parallel upstream in the stateless
   * projection; only the O(bitset-probe) fold serializes, the same
   * trade as any total-order stream fold. State per stream: ONE
   * bitset entry of `expectedGrams · bitsPerGram / 8` bytes (6 MiB at
   * the 4M-gram default) — not per gram, not per doc.
   */
  def streamingNgramNovelty(
      docs: DataFrame, n: Int = 3, bitsPerGram: Int = 12,
      expectedGrams: Long = 1L << 22): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    graft.functions.GraftFunctions.register(spark)
    require(bitsPerGram >= 4 && bitsPerGram <= 24,
      s"streamingNgramNovelty: bitsPerGram must be in [4, 24]: $bitsPerGram")
    val nWords = (expectedGrams * bitsPerGram + 63L) / 64L
    require(nWords <= maxNoveltyWords,
      s"streamingNgramNovelty: $expectedGrams grams x $bitsPerGram bits = " +
        s"$nWords words > maxNoveltyWords=$maxNoveltyWords (" +
        s"${maxNoveltyWords * 8 / (1 << 20)} MiB of state)")
    val mBits = nWords * 64L
    // k* = ln2 · bits/gram — buildBloomWords' formula, one rule repo-wide
    val k = math.max(1, math.min(16, math.round(bitsPerGram * math.log(2.0)).toInt))
    docs
      .select(col("doc_id"),
        array_distinct(call_function("graft_shingle_hashes", col("text"), lit(n)))
          .as("grams"))
      .as[(Long, Seq[Long])]
      .groupByKey(_ => 0) // ONE group: the sequential novelty fold
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: Int, rows: Iterator[(Long, Seq[Long])],
         state: org.apache.spark.sql.streaming.GroupState[NoveltyState]) => {
          val words = state.getOption.map(_.words)
            .getOrElse(new Array[Long](nWords.toInt))
          val out = rows.toArray.sortBy(_._1).map { case (id, gs) =>
            var ng = 0L; var nn = 0L
            gs.foreach { g =>
              ng += 1
              if (!graft.functions.BloomKernel.contains(g, words, k)) {
                nn += 1
                var i = 0
                while (i < k) {
                  val p = graft.functions.BloomKernel.position(g, i, mBits)
                  words((p >>> 6).toInt) |= 1L << (p & 63L).toInt
                  i += 1
                }
              }
            }
            // the batch key's r6 floor formula, null on gram-less docs
            val frac: Option[Double] =
              if (ng > 0) Some(math.floor(nn.toDouble / ng * 1e6 + 0.5) / 1e6)
              else None
            (id, ng, nn, frac)
          }
          state.update(NoveltyState(words))
          out.iterator
        })
      .toDF("doc_id", "n_grams", "n_novel", "novel_frac6")
  }
}
