package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming KMV (bottom-k) distinct sketching — the continuous use of
 * the merge property [[graft.operators.Sketches.kmvUnionJaccard]]
 * proves for the batch side: bottom-k sketches built independently
 * COMPOSE, so a stream can fold each micro-batch into O(k) state and
 * the union-of-shards sketch at any moment equals the batch sketch of
 * everything seen (exactly — same hashes, same k — not just in
 * estimate).
 *
 * Scale shape: state is sharded by hash (`shards` groups, each
 * holding ≤k longs), so micro-batch folding parallelizes across
 * `shards` tasks instead of funneling the batch through one group —
 * and the global bottom-k is recoverable downstream because the k
 * smallest of a union are always contained in the union of each
 * shard's k smallest. Each shard emits its updated sketch once per
 * batch that touches it (append mode; `upd` is the shard's update
 * counter, so "latest per shard" is a max-upd filter downstream).
 *
 * The row→hash map is the same 32-bit md5 prefix as the batch
 * operators' `hash32` (first 8 hex chars as an unsigned int), so
 * streaming and batch sketches are hash-identical by construction —
 * the spec asserts estimate equality to the rounded digit.
 */
object StreamingSketches {

  final case class KmvShardState(hs: Array[Long], upd: Long)
  final case class KmvShardSketch(shard: Int, upd: Long, hs: Seq[Long])

  private[graft] def hash32(key: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16)

  final case class KmvQShardState(hs: Array[Long], vs: Array[Double], upd: Long)
  final case class KmvQShardSketch(
      shard: Int, upd: Long, hs: Seq[Long], vs: Seq[Double])

  /**
   * Streaming QUANTILE sketching — the continuous twin of
   * [[graft.operators.Sketches.kmvQuantiles]]: each shard folds its
   * micro-batch rows into the k smallest (hash, value) pairs seen so
   * far. The global sample's k smallest by (h, v) are always
   * contained in the union of the shard sketches (the same
   * containment argument as [[kmvShardSketches]]), so downstream
   * recovers the EXACT batch sample — union the latest shard
   * sketches, bottom-k by (h, v), nearest-rank pick — and the
   * estimates match the batch operator to the digit (spec-asserted).
   * State is ≤k (hash, value) pairs per shard; rows carry `key`
   * (string) and `v` (double).
   */
  def kmvQuantileShardSketches(
      rows: DataFrame, k: Int = 256, shards: Int = 16): DataFrame = {
    require(k >= 2, s"kmv quantiles: k must be >= 2: $k")
    require(shards >= 1, s"kmv quantiles: shards must be >= 1: $shards")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select("key", "v").as[(String, Double)]
      .map { case (s, v) => val h = hash32(s); ((h % shards).toInt, h, v) }
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (shard: Int, batch: Iterator[(Int, Long, Double)],
         state: GroupState[KmvQShardState]) => {
          val prev = state.getOption.getOrElse(
            KmvQShardState(Array.empty, Array.empty, 0L))
          val merged = (prev.hs.zip(prev.vs) ++ batch.map(r => (r._2, r._3)))
            .sortBy(identity).take(k)
          val next = KmvQShardState(
            merged.map(_._1), merged.map(_._2), prev.upd + 1)
          state.update(next)
          Iterator.single(KmvQShardSketch(
            shard, next.upd, next.hs.toSeq, next.vs.toSeq))
        })
      .toDF()
  }

  /** `keys` must carry a string column `key`; returns the append-mode
    * (shard, upd, hs) sketch feed. */
  def kmvShardSketches(
      keys: DataFrame, k: Int = 32, shards: Int = 16): DataFrame = {
    require(k >= 2, s"kmv: k must be >= 2: $k")
    require(shards >= 1, s"kmv: shards must be >= 1: $shards")
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select("key").as[String]
      .map { s => val h = hash32(s); ((h % shards).toInt, h) }
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (shard: Int, rows: Iterator[(Int, Long)],
         state: GroupState[KmvShardState]) => {
          val prev = state.getOption.getOrElse(KmvShardState(Array.empty, 0L))
          val merged = (prev.hs ++ rows.map(_._2)).distinct.sorted.take(k)
          val next = KmvShardState(merged, prev.upd + 1)
          state.update(next)
          Iterator.single(KmvShardSketch(shard, next.upd, merged.toSeq))
        })
      .toDF()
  }
}
