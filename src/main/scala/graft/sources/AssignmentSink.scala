package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * MERGE-shaped sink for cluster-assignment deltas
 * ([[graft.dedup.Dedup.incrementalClustersDelta]] emits exactly the
 * rows a batch changed): the stored table is parquet partitioned by
 * `shard = doc_id mod shards`, and an upsert rewrites ONLY the shards
 * the delta touches — Spark's dynamic partition overwrite replaces
 * just the partitions present in the written frame, so the write cost
 * is O(touched shards), not O(table). On a lakehouse table the same
 * contract is one `MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED
 * INSERT`; this is the plain-parquet equivalent with the identical
 * delta input.
 *
 * Why rows must be grouped into shards at all: parquet has no row
 * updates, so the finest replaceable unit is a partition — `shards`
 * trades write amplification (rows rewritten per touched id) against
 * partition count. The touched-shard set is collected to the driver
 * to drive partition PRUNING on the read side; it is bounded by
 * `shards` (a config constant), never by the data.
 */
object AssignmentSink {

  private def shardCol(shards: Int) = pmod(col("doc_id"), lit(shards.toLong))

  /** Initialize (or fully rewrite) the stored assignment table. */
  def init(tablePath: String, assignments: DataFrame, shards: Int = 64): Unit =
    assignments
      .withColumn("shard", shardCol(shards))
      .write.mode("overwrite").partitionBy("shard").parquet(tablePath)

  /** Upsert a delta: rows whose doc_id appears in `delta` are
    * replaced, other rows of touched shards are carried over
    * unchanged, untouched shards are NOT rewritten (their files stay
    * byte-identical on disk — asserted in AssignmentSinkSpec).
    *
    * The merge is staged: the rewritten shard contents are first
    * written to a hidden `_staging` dir under the table (invisible to
    * partition discovery), then a second job re-reads the staging copy
    * and lands it with dynamic partition overwrite — so no job ever
    * reads the files its own commit is deleting. The final landing is
    * still per-partition, not transactional: a crash mid-commit (or a
    * concurrent reader) can observe touched shards in a mixed old/new
    * state — plain parquet has no atomic multi-partition swap; a
    * lakehouse MERGE is the transactional equivalent of this contract.
    * Untouched shards are never at risk (asserted below: every
    * pre-existing shard partition must survive the overwrite, guarding
    * against a future Spark behavior change demoting dynamic mode to a
    * full-table overwrite). */
  def upsertDelta(tablePath: String, delta: DataFrame, shards: Int = 64): Unit = {
    val spark = delta.sparkSession
    val d = delta.withColumn("shard", shardCol(shards))
    // bounded by `shards`, so the driver round-trip is O(config)
    val touched = d.select("shard").distinct().collect().map(_.getLong(0))
    // empty delta = no-op (a zero-row staging write would produce no
    // parquet files and the read-back would fail on schema inference)
    if (touched.isEmpty) return
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def shardDirs(): Set[String] =
      fs.listStatus(table).map(_.getPath.getName).filter(_.startsWith("shard=")).toSet
    val preShards = shardDirs()
    val staging = new org.apache.hadoop.fs.Path(table, "_staging_upsert")
    val existing = spark.read.parquet(tablePath)
      .where(col("shard").isin(touched: _*)) // partition-pruned scan
      .join(d.select("doc_id"), Seq("doc_id"), "left_anti")
    existing.unionByName(d)
      .write.mode("overwrite").partitionBy("shard").parquet(staging.toString)
    try
      spark.read.parquet(staging.toString)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard").parquet(tablePath)
    finally fs.delete(staging, true)
    val lost = preShards -- shardDirs()
    require(lost.isEmpty,
      s"dynamic partition overwrite dropped untouched shards $lost of $tablePath — " +
        "partitionOverwriteMode=dynamic was not honored")
  }

  /** The stored assignments (shard column dropped). */
  def read(spark: org.apache.spark.sql.SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath).drop("shard")
}
