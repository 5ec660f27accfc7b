package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * The engine's lineage barrier, with a fault-tolerance knob.
 *
 * Several operators need a hard barrier before a Generate/self-join
 * over an expensive expression chain (see [[graft.dedup.Dedup]] for
 * the three measured reasons). HOW that barrier is realized is a
 * deployment decision, controlled by the session conf
 * `spark.graft.materialize.mode`:
 *
 *  - `local` (default): `localCheckpoint(eager)` — fastest (blocks in
 *    executor local store, no DFS round-trip), the right call on
 *    local/bench shapes. NOT fault-tolerant: blocks live only on the
 *    executors that computed them and lineage is truncated, so at
 *    cluster scale a lost executor kills the job instead of
 *    recomputing.
 *  - `persist`: `persist(DISK_ONLY_2)` + an eager count to populate.
 *    Two disk replicas tolerate a single executor loss, and the
 *    lineage is KEPT, so even a double loss recomputes instead of
 *    failing. No checkpoint directory needed.
 *  - `checkpoint`: `checkpoint(eager)` to the reliable store set via
 *    `sparkContext.setCheckpointDir` (HDFS/S3). Survives any number
 *    of executor losses; the right call for long dedup/clustering
 *    jobs at 100 TB. Throws (from Spark) if no checkpoint dir is set.
 *
 * Cache population is not column-pruned (the InMemoryRelation stores
 * the full plan output), so the eager `count()` in persist mode
 * materializes every column — unlike a bare count used for timing
 * (see STATUS.md lesson 1, which is about measuring, not caching).
 */
object Materialize {

  val ModeKey = "spark.graft.materialize.mode"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val warnedPersistPin = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** THE size-gate rule, shared by [[barrierAbove]] and
    * [[graft.operators.RangeRank]] (one definition — the gates must
    * not drift): true when `sizeOf`'s ESTIMATED size (plan
    * statistics — no job) is under the per-operator conf key's
    * threshold, i.e. the cheap small-scale plan should be kept. */
  /** Every gate conf key ever consulted in this JVM — the registry
    * the AuditProbe sweep reads so it can force EVERY gate open
    * without a hand-maintained list (review finding: a parallel list
    * silently misses a new key's gate and audits the wrong plan). */
  val registeredGateKeys: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def underGate(
      sizeOf: DataFrame, confKey: String,
      defaultMinBytes: Long = 32L * 1024 * 1024): Boolean = {
    registeredGateKeys.add(confKey)
    val minBytes = BigInt(scala.util.Try(
      sizeOf.sparkSession.conf.get(confKey).toLong).getOrElse(defaultMinBytes))
    sizeOf.queryExecution.optimizedPlan.stats.sizeInBytes < minBytes
  }

  /** Size-gated [[barrier]] (the ft1/au1 precedent): skip the
    * checkpoint when [[underGate]] holds, because below the threshold
    * the consumers' recomputes are cheaper than the fixed checkpoint
    * write; above it the barrier's dedup wins. */
  def barrierAbove(
      df: DataFrame, sizeOf: DataFrame, confKey: String,
      defaultMinBytes: Long = 32L * 1024 * 1024): DataFrame =
    if (underGate(sizeOf, confKey, defaultMinBytes)) df else barrier(df)

  def barrier(df: DataFrame): DataFrame = {
    val mode = scala.util.Try(df.sparkSession.conf.get(ModeKey)).getOrElse("local")
    mode match {
      case "local" => df.localCheckpoint(eager = true)
      case "persist" =>
        val p = df.persist(StorageLevel.DISK_ONLY_2)
        p.count()
        p
      case "checkpoint" => df.checkpoint(eager = true)
      case other =>
        throw new IllegalArgumentException(
          s"$ModeKey must be local | persist | checkpoint, got: $other")
    }
  }

  /** A barrier that GUARANTEES lineage truncation — required when the
    * barrier's job is to pin a NONDETERMINISTIC assignment (sampled
    * `repartitionByRange` boundaries + `monotonically_increasing_id`
    * in [[graft.operators.RangeRank]]) that several consumers must
    * see identically. [[barrier]]'s `persist` mode keeps lineage: a
    * double executor loss RECOMPUTES the input, and a recompute
    * re-samples boundaries and re-assigns ids — the consumers then
    * silently disagree (driver-collected offsets vs executor rows).
    * So here `persist` is overridden to a truncating form:
    * `checkpoint` when a checkpoint dir is configured (keeps the
    * any-loss fault tolerance persist users want), else
    * `localCheckpoint` (correct pin; an executor loss now FAILS the
    * job loudly instead of silently mis-ranking — the documented
    * trade). `local` / `checkpoint` modes already truncate. */
  def pinBarrier(df: DataFrame): DataFrame = {
    val mode = scala.util.Try(df.sparkSession.conf.get(ModeKey)).getOrElse("local")
    mode match {
      case "checkpoint" => df.checkpoint(eager = true)
      case "persist" if df.sparkSession.sparkContext.getCheckpointDir.isDefined =>
        df.checkpoint(eager = true)
      case "persist" =>
        // the operator loses the fault tolerance the user selected with
        // persist mode; leave a runtime breadcrumb, not just scaladoc
        // (ADVICE r14) — once per JVM, not per pinned frame
        if (warnedPersistPin.compareAndSet(false, true))
          log.warn(s"$ModeKey=persist with no checkpoint dir: pinning a " +
            "nondeterministic frame via localCheckpoint (an executor loss " +
            "FAILS the job instead of recomputing). Call " +
            "sparkContext.setCheckpointDir to regain fault tolerance here.")
        df.localCheckpoint(eager = true)
      case "local" => df.localCheckpoint(eager = true)
      case other =>
        throw new IllegalArgumentException(
          s"$ModeKey must be local | persist | checkpoint, got: $other")
    }
  }
}
