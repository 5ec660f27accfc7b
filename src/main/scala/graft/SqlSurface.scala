package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/**
 * SQL surface: registers the canonical frame and lazy detector views
 * so the whole engine is reachable from `spark.sql(...)` (SURVEY.md
 * §7.3 — views rather than UDTFs: detectors are window-shaped, not
 * row-generators, so a view over the lazy DataFrame plan is the
 * faithful exposure; Catalyst still optimizes through it). Also
 * registers the native `graft_dot` / `graft_isect` functions.
 */
object SqlSurface {

  /** View names created, for discovery. */
  val Views: Seq[String] = Seq(
    "graft_series",
    "graft_extreme_value_events", "graft_flat_line_events",
    "graft_extreme_change_events", "graft_data_gap_events",
    "graft_storm_events", "graft_spike_valley_events",
    "graft_inferred_steps")

  /** Corpus-side views over a `(doc_id, text)` frame. `graft_documents`,
    * `graft_doc_stats` (token/quality/language/fingerprint columns) and
    * `graft_doc_splits` are pure lazy projections; the dedup views
    * marked EAGER below run their hash/propagation jobs at
    * registration time (their operators checkpoint intermediate hash
    * frames / iterate to a fixpoint — that work cannot be deferred
    * into a view without re-running it per query). Views that need an
    * input beyond the docs frame register only when their parameter is
    * supplied: `graft_bm25` (query terms), `graft_dsir_select` /
    * `graft_dsir_heldout` (target predicate), `graft_curation`
    * (eval-set predicate). */
  val CorpusViews: Seq[String] = Seq(
    "graft_documents", "graft_doc_stats", "graft_doc_splits",
    "graft_pii_scrub",
    "graft_exact_dedup" /* EAGER */, "graft_minhash_pairs" /* EAGER */,
    "graft_dedup_clusters" /* EAGER */,
    "graft_substring_dedup" /* EAGER */,
    "graft_substring_keepfirst" /* EAGER */,
    "graft_canonical_quality" /* EAGER (reuses the cluster fixpoint) */,
    "graft_hll_distinct", "graft_kmv_distinct", "graft_weighted_sample",
    "graft_quality_screen",
    "graft_cluster_splits" /* EAGER (reuses the cluster fixpoint) */,
    "graft_kmv_quantiles" /* EAGER (row-count for the exact ranks) */,
    "graft_bm25" /* EAGER; only with bm25Terms */,
    "graft_dsir_select" /* EAGER; only with dsirTarget */,
    "graft_dsir_heldout" /* EAGER; only with dsirTarget */,
    "graft_curation" /* EAGER; only with curationEval */,
    "graft_bloom_decontaminate" /* EAGER; only with curationEval */,
    "graft_chunks" /* lazy scan projection */,
    "graft_triangles" /* EAGER */)

  def registerCorpus(
      docs: DataFrame, minhashThreshold: Double = 0.6,
      bm25Terms: Seq[String] = Nil,
      dsirTarget: Option[org.apache.spark.sql.Column] = None,
      curationEval: Option[org.apache.spark.sql.Column] = None): Unit = {
    import org.apache.spark.sql.functions._
    val tf = graft.functions.TextFunctions
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.createOrReplaceTempView("graft_documents")
    docs.select(col("doc_id"),
        tf.tokenCount(col("text")).as("n_tokens"),
        tf.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        tf.qualityScore(col("text")).as("quality"),
        tf.langGuess(col("text")).as("lang_guess"),
        call_function("graft_norm_fp", col("text")).as("fingerprint"))
      .createOrReplaceTempView("graft_doc_stats")
    docs.select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation").otherwise("test"))
      .createOrReplaceTempView("graft_doc_splits")
    val pairs = graft.dedup.Dedup.minhashNearDups(docs, minhashThreshold)
    graft.dedup.Dedup.exactDedup(docs).createOrReplaceTempView("graft_exact_dedup")
    pairs.createOrReplaceTempView("graft_minhash_pairs")
    graft.dedup.Dedup.dedupClusters(docs, pairs)
      .createOrReplaceTempView("graft_dedup_clusters")
    // quality/scrub layers (lazy views: nothing computes until queried)
    docs.select(col("doc_id"),
        tf.piiCount(col("text"), tf.EmailRe).as("n_emails"),
        tf.piiCount(col("text"), tf.SsnRe).as("n_ssns"),
        tf.piiCount(col("text"), tf.Ipv4Re).as("n_ips"),
        tf.piiCount(col("text"), tf.PhoneRe).as("n_phones"),
        tf.piiCount(col("text"), tf.AddressRe).as("n_addresses"),
        md5(tf.piiScrub(col("text"))).as("scrub_md5"))
      .createOrReplaceTempView("graft_pii_scrub")
    // substring-level exact dedup (Lee et al. EXACTSUBSTR), both
    // removal semantics
    graft.dedup.Dedup.substringDedup(docs, l = 5)
      .createOrReplaceTempView("graft_substring_dedup")
    graft.dedup.Dedup.substringDedup(docs, l = 5, keepFirst = true)
      .createOrReplaceTempView("graft_substring_keepfirst")
    // quality-aware canonical selection over the SAME near-dup
    // clusters the graft_dedup_clusters view exposes
    val quality6 = docs.select(col("doc_id"),
      tf.qualityScore(col("text")).as("quality6"))
    graft.dedup.Dedup.canonicalByQuality(
        graft.dedup.Dedup.dedupClusters(docs.select(col("doc_id")), pairs), quality6)
      .createOrReplaceTempView("graft_canonical_quality")
    // cu3's classifier screen (lazy zero-exchange projection) and
    // sp1's leakage-safe split (cluster-keyed hash over the SAME
    // near-dup clusters graft_dedup_clusters exposes)
    docs.select(col("doc_id"),
        call_function("graft_quality_score", col("text"),
          typedlit(graft.queries.PipelineQueries.qualityLexiconWeights),
          lit(0.0), lit(2)).as("logit6"))
      .withColumn("keep", coalesce(
        col("logit6") >= graft.queries.PipelineQueries.QualityKeepThreshold,
        lit(false)))
      .createOrReplaceTempView("graft_quality_screen")
    graft.dedup.Dedup.dedupClusters(docs.select(col("doc_id")), pairs)
      .select(col("doc_id"), col("cluster_id"))
      .withColumn("bucket",
        (graft.queries.CorpusQueries.idHash(col("cluster_id")) % 100).cast("int"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation").otherwise("test"))
      .createOrReplaceTempView("graft_cluster_splits")
    graft.operators.Sketches.kmvQuantiles(
        docs, col("doc_id"), tf.tokenCount(col("text")).cast("double"))
      .createOrReplaceTempView("graft_kmv_quantiles")
    graft.operators.Sketches.hllDistinct(docs, col("text"))
      .createOrReplaceTempView("graft_hll_distinct")
    graft.operators.Sketches.kmvDistinct(docs, col("text"))
      .createOrReplaceTempView("graft_kmv_distinct")
    graft.queries.CorpusQueries.weightedSample(docs, k = 500)
      .createOrReplaceTempView("graft_weighted_sample")
    if (bm25Terms.nonEmpty)
      graft.queries.TextAnalysis.bm25TopK(docs, bm25Terms)
        .createOrReplaceTempView("graft_bm25")
    dsirTarget.foreach { t =>
      graft.queries.CorpusQueries.dsirSelect(docs, t)
        .createOrReplaceTempView("graft_dsir_select")
      graft.queries.CorpusQueries.dsirSelect(docs, t, heldOutRaw = true)
        .createOrReplaceTempView("graft_dsir_heldout")
    }
    curationEval.foreach { isEval =>
      val cur = docs.where(!isEval)
      val dup = graft.dedup.Dedup.exactDedup(cur)
        .select(col("doc_id"), col("is_dup").as("is_exact_dup"))
      val dec = graft.dedup.Dedup.decontaminate(cur, docs.where(isEval))
        .select(col("doc_id"), col("n_hits"), col("contaminated"))
      cur.select(col("doc_id"))
        .join(dup, Seq("doc_id"))
        .join(dec, Seq("doc_id"))
        .join(quality6, Seq("doc_id"))
        .withColumn("keep",
          !col("is_exact_dup") && !col("contaminated") && col("quality6") >= 0.5)
        .createOrReplaceTempView("graft_curation")
      // bf1's bitset-screened decontamination against the same eval
      // slice (EAGER: the bloom bitset builds at registration)
      graft.dedup.Dedup.bloomDecontaminate(cur, docs.where(isEval))
        .createOrReplaceTempView("graft_bloom_decontaminate")
    }
    // round-11 corpus layers: the overlapping chunker (lazy scan
    // projection) and per-node triangle counts over the SAME pair
    // graph graft_minhash_pairs exposes (EAGER: degree orientation
    // materializes the oriented edge list)
    graft.queries.CorpusQueries.chunkOverlap(docs, window = 40, stride = 30)
      .createOrReplaceTempView("graft_chunks")
    graft.dedup.Dedup.triangleCounts(pairs.select(col("doc_a"), col("doc_b")))
      .createOrReplaceTempView("graft_triangles")
  }

  /** Similarity/retrieval views over an `(vec_id, embedding)` frame —
    * the s1–s5/e1/e2 family. `queries` drives the ANN/IVF views,
    * `pqQuery` (exactly ONE vector) drives the PQ family, `centroids`
    * the IVF cell grids. PQ registration collects the O(m·k) codebook
    * driver-side at registration (the encode itself stays a lazy
    * zero-exchange projection). */
  val EmbeddingViews: Seq[String] = Seq(
    "graft_embeddings", "graft_int8_quantize", "graft_ann_topk",
    "graft_ivf_topk", "graft_pq_codes", "graft_pq_topk",
    "graft_ivfadc_topk", "graft_ivfadc_residual_topk",
    "graft_binary_hamming_topk", "graft_binary_rerank_topk",
    "graft_hard_negatives") // registered only when embs/queries carry `label`

  /** AT-SCALE ROUTING (read before pointing a 100 TB corpus at these
    * views — VERDICT r13/r14): two of the registered shapes are EXACT
    * BASELINES that are quadratic by design, kept because they define
    * the ground truth the scale-safe siblings are measured against
    * (`rc1`/`rc2` recall telemetry). Route production traffic to the
    * sibling; reserve the exact form for bounded slices and audits.
    *
    *  - `graft_ann_topk` ([[graft.similarity.Similarity.bruteForceTopK]],
    *    O(|queries|·|corpus|) dots) → use `graft_ivf_topk` /
    *    `graft_ivfadc_topk` (cell-pruned; recall measured by rc1) or
    *    `graft_binary_rerank_topk` (sign-bit screen + exact rerank).
    *  - [[graft.similarity.Similarity.nearDupPairs]] (x5's chunked
    *    all-pairs cos) → use [[graft.similarity.Similarity.lshNearDupPairs]]
    *    (x6; banded candidates) or its multi-probe/adaptive variants
    *    (x8–x10) at any corpus size where N²/2 dots is not a number
    *    you would say out loud.
    *  - [[graft.similarity.Similarity.embeddingDecontaminate]] (dc4,
    *    full corpus×eval cross) → use
    *    [[graft.similarity.Similarity.embeddingDecontaminateLsh]] (dc5;
    *    banded, under-flags only — recall vs dc4 is the shipped
    *    `rc2_dc5_recall` key, 0.75 on the driver calibration data).
    */
  def registerEmbeddings(
      embs: DataFrame, queries: DataFrame, pqSeeds: DataFrame,
      pqQuery: DataFrame, centroids: DataFrame,
      k: Int = 5, topK: Int = 20, nProbe: Int = 3): Unit = {
    val S = graft.similarity.Similarity
    graft.functions.GraftFunctions.register(embs.sparkSession)
    embs.createOrReplaceTempView("graft_embeddings")
    S.quantizeInt8Stats(embs).createOrReplaceTempView("graft_int8_quantize")
    // EXACT baseline — O(|queries|·|corpus|); at scale query
    // graft_ivf_topk / graft_ivfadc_topk instead (see routing note)
    S.bruteForceTopK(queries, embs, k).createOrReplaceTempView("graft_ann_topk")
    S.ivfTopK(queries, embs, centroids, k, nProbe)
      .createOrReplaceTempView("graft_ivf_topk")
    // hard-negative mining needs a `label` column on both frames;
    // registered only when the caller's corpus carries one (the
    // contrastive-training shape) — same probe chain as graft_ivf_topk,
    // label-mismatch applied before the top-k window
    if (embs.columns.contains("label") && queries.columns.contains("label"))
      S.ivfHardNegatives(queries, embs, centroids, k, nProbe)
        .createOrReplaceTempView("graft_hard_negatives")
    else
      // ADVICE r15: without this drop, re-registering with unlabeled
      // frames would leave the view silently bound to the PREVIOUS
      // corpus while every sibling view is replaced — the view's
      // presence must always reflect the latest registration
      embs.sparkSession.catalog.dropTempView("graft_hard_negatives")
    S.pqEncodeAdc(embs, pqSeeds, pqQuery).createOrReplaceTempView("graft_pq_codes")
    S.pqTopK(embs, pqSeeds, pqQuery, topK).createOrReplaceTempView("graft_pq_topk")
    S.ivfAdcTopK(embs, pqSeeds, pqQuery, centroids, topK, nProbe = nProbe)
      .createOrReplaceTempView("graft_ivfadc_topk")
    S.ivfAdcResidualTopK(embs, pqSeeds, pqQuery, centroids, topK, nProbe = nProbe)
      .createOrReplaceTempView("graft_ivfadc_residual_topk")
    S.binaryHammingTopK(embs, pqQuery, topK)
      .createOrReplaceTempView("graft_binary_hamming_topk")
    S.binaryRerankTopK(embs, pqQuery, candidates = topK * 5, topK = topK)
      .createOrReplaceTempView("graft_binary_rerank_topk")
  }

  /** Event-log views over a raw `(user_id, ts, event_id, event_type,
    * value)` frame: the ordered funnel and the per-series robust
    * outlier screen (both lazy — nothing computes until queried). */
  val EventViews: Seq[String] = Seq(
    "graft_events", "graft_funnel", "graft_mad_outliers",
    "graft_scd2_history", "graft_seasonal_strength", "graft_feature_scale",
    "graft_active_users", "graft_last_touch", "graft_windowed_funnel")

  def registerEvents(
      events: DataFrame, funnelStages: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    events.createOrReplaceTempView("graft_events")
    graft.queries.TemporalQueries
      .funnel(events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")), funnelStages)
      .createOrReplaceTempView("graft_funnel")
    def canonical = events.select(
      col("user_id").cast("string").as("series_id"),
      col("ts"), col("event_id"),
      graft.operators.Kernels.nanToNull(col("value")).as("value"))
    graft.queries.TimeSeriesQueries.madOutliers(canonical)
      .createOrReplaceTempView("graft_mad_outliers")
    // round-11 event-side layers (all lazy)
    graft.queries.TemporalQueries.scd2History(events)
      .createOrReplaceTempView("graft_scd2_history")
    graft.queries.TimeSeriesQueries.seasonalDecompose(canonical)
      .createOrReplaceTempView("graft_seasonal_strength")
    graft.queries.TimeSeriesQueries.featureScale(canonical)
      .createOrReplaceTempView("graft_feature_scale")
    // round-12 event-side layers (all lazy)
    graft.queries.TemporalQueries.activeUsers(events)
      .createOrReplaceTempView("graft_active_users")
    graft.queries.TemporalQueries.lastTouchAttribution(events, "purchase")
      .createOrReplaceTempView("graft_last_touch")
    graft.queries.TemporalQueries
      .windowedFunnel(events.select(col("user_id"), col("ts"),
        col("event_id"), col("event_type")), funnelStages,
        windowUs = 7L * 86400L * 1000000L)
      .createOrReplaceTempView("graft_windowed_funnel")
  }

  def register(
      ts: DataFrame,
      storm: StormEvents = StormEvents(frequency = Some("1D")),
      extremeValue: ExtremeValueEvents = ExtremeValueEvents(),
      flatLine: FlatLineEvents = FlatLineEvents(),
      extremeChange: ExtremeChangeEvents = ExtremeChangeEvents(),
      dataGap: DataGapEvents = DataGapEvents(),
      spikeValley: SpikeValleyEvents = SpikeValleyEvents()): Unit = {
    graft.functions.GraftFunctions.register(ts.sparkSession)
    ts.createOrReplaceTempView("graft_series")
    extremeValue.detect(ts).createOrReplaceTempView("graft_extreme_value_events")
    flatLine.detect(ts).createOrReplaceTempView("graft_flat_line_events")
    extremeChange.detect(ts).createOrReplaceTempView("graft_extreme_change_events")
    dataGap.detect(ts).createOrReplaceTempView("graft_data_gap_events")
    storm.detect(ts).createOrReplaceTempView("graft_storm_events")
    spikeValley.detect(ts).createOrReplaceTempView("graft_spike_valley_events")
    Kernels.inferStep(ts).createOrReplaceTempView("graft_inferred_steps")
  }
}
