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
}
