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
}
