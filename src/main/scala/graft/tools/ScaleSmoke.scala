package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only 200× scale smoke for the dedup / corpus / similarity
  * layers (SCALE_NOTES.md): synthesizes a deterministic 1M-document
  * corpus (60 tokens each, 50k-token vocabulary, 1% planted near-dups
  * sharing 59/60 tokens) and 200k×64 embeddings into `outDir` with the
  * driver testdata schemas, then times the PRODUCTION query functions
  * (SparkEntry.queries) against it unchanged. Usage:
  *   sbt "runMain graft.tools.ScaleSmoke [outDir]"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.filterNot(_.startsWith("--")).getOrElse("/tmp/graft_scale")
    val skipGen = args.contains("--skip-gen")
    val nDocs = 1000000L
    val nVecs = 200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- synthesize ------------------------------------------------------
    // near-dup planting: doc ids ≡ 1 (mod 100) copy the previous doc's
    // first 59 tokens and change the last one
    if (!skipGen) {
    val base = when(col("id") % 100 === 1, col("id") - 1).otherwise(col("id"))
    val toks = transform(sequence(lit(0), lit(58)),
      i => concat(lit("w"), pmod(xxhash64(base * 59 + i), lit(50000L))))
    val lastTok = concat(lit("w"), pmod(xxhash64(col("id") * 7919 + 13), lit(50000L)))
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", concat(toks, array(lastTok))).as("text"),
        lit("en").as("lang"), lit("synth").as("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.range(nVecs)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => (pmod(xxhash64(col("id") * 64 + i), lit(2000L)).cast("double") / 1000.0 - 1.0)
            .cast("float")).as("embedding"),
        (col("id") % 10).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }

    // --- time the production paths (min of 2 runs = steady state; the
    // first run carries JIT/codegen warmup, which at this data size is
    // tens of seconds of C2 compilation on the md5 kernels) -----------
    def clearPersisted(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val keys = Seq("x1_exact_dedup", "x2_minhash_lsh", "x3_simhash",
      "x4_ngram_jaccard", "cc1_dedup_clusters", "v1_vocab_topk",
      "sm1_hash_split", "pk1_sequence_pack", "t1_token_stats", "t2_quality")
    keys.foreach { name =>
      var rows = 0L
      val dts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        rows = graft.SparkEntry.queries(name)(spark, outDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        clearPersisted(); System.gc()
        dt
      }
      println(f"SCALE $name%-24s ${dts.min}%8.1f s  rows=$rows")
    }
    // similarity on 200k vectors: IVF with 200 modulo centroids, 100 queries
    val e = graft.sources.Tables.read(spark, outDir, "embeddings")
    val dts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      graft.similarity.Similarity.ivfTopK(
        e.where(col("vec_id") < 100), e,
        centroids = e.where(col("vec_id") % 1000 === 0), k = 5, nProbe = 3).count()
      val dt = (System.nanoTime() - t0) / 1e9
      clearPersisted(); System.gc()
      dt
    }
    println(f"SCALE s2_ivf_topk_200k       ${dts.min}%8.1f s")
    spark.stop()
  }
}
