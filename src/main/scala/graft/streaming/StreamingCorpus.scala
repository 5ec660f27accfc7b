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
    * the sampled stream, with the bucket exposed for auditability. */
  def mixtureSample(docs: DataFrame, rates: DataFrame): DataFrame =
    docs
      .join(broadcast(rates.select(col("source"), col("rate_bp"))), Seq("source"))
      .withColumn("bucket", graft.queries.CorpusQueries.idHash(col("doc_id")) % 10000)
      .where(col("bucket") < col("rate_bp"))
}
