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
}
