package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev-only stage-by-stage timing of the dedup pipelines. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val docs = graft.sources.Tables.read(spark, sfDir, "documents")
    import graft.dedup.Dedup._
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      timed("x1-fp-compute") {
        parallelize(docs).select(col("doc_id"),
          graft.functions.TextFunctions.normalizedFingerprint(col("text")).as("fingerprint"))
          .agg(count(col("fingerprint"))).collect()
      }
      timed("x1-fp-ckpt") {
        parallelize(docs).select(col("doc_id"),
          graft.functions.TextFunctions.normalizedFingerprint(col("text")).as("fingerprint"))
          .localCheckpoint(eager = true)
      }
      timed("full-x1")(exactDedup(docs).count())
      val digs = timed("digs-ckpt") {
        parallelize(docs)
          .select(col("doc_id"), wordShingles(col("text")).as("shingles"))
          .where(size(col("shingles")) > 0)
          .select(col("doc_id"), shingleHashes(col("shingles")).as("digs"))
          .localCheckpoint(eager = true)
      }
      val sigs = digs.select(col("doc_id"), minhashSignature(col("digs"), 12).as("sig"))
      timed("sigs-count")(sigs.agg(sum(element_at(col("sig"), 1))).collect())
      val withBands = timed("bands-ckpt") {
        sigs.select(col("doc_id"), lshBands(col("sig"), 4, 3).as("bands"))
          .localCheckpoint(eager = true)
      }
      val cands = bucketPairs(
        withBands.select(col("doc_id"),
          posexplode(col("bands")).as(Seq("band_idx", "bucket"))),
        "band_idx", "bucket")
      timed("cands-count")(println("  n_cands=" + cands.count()))
      val hsets = digs.select(col("doc_id"), array_sort(array_distinct(col("digs"))).as("hset"))
      timed("full-x2")(graft.dedup.Dedup.minhashNearDups(docs, threshold = 0.6).count())
      timed("full-x3")(graft.dedup.Dedup.simhashNearDups(docs, maxHamming = 3).count())
      timed("full-x4")(graft.dedup.Dedup.ngramJaccardPairs(docs, threshold = 0.8).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
