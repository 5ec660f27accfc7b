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
    * into a view without re-running it per query). */
  val CorpusViews: Seq[String] = Seq(
    "graft_documents", "graft_doc_stats", "graft_doc_splits",
    "graft_pii_scrub",
    "graft_exact_dedup" /* EAGER */, "graft_minhash_pairs" /* EAGER */,
    "graft_dedup_clusters" /* EAGER */)

  def registerCorpus(docs: DataFrame, minhashThreshold: Double = 0.6): Unit = {
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
