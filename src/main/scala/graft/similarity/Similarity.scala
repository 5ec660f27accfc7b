package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`) —
 * north-star extension (BASELINE.json), no reference counterpart.
 *
 * Three operators:
 *  - [[cosine]]: codegen'd zip_with/aggregate fold in double — no UDF;
 *  - [[bruteForceTopK]]: exact top-k for a (small) query set against
 *    the full corpus: broadcast the queries, one scan of the corpus,
 *    per-query ranking window. Exact baseline; O(|Q|·N) — fine when
 *    |Q| is bounded, the corpus side streams;
 *  - [[ivfTopK]]: the scale path. A fixed centroid set partitions the
 *    corpus (assignment = one broadcast join, computed where the data
 *    lives); a query probes only its `nProbe` nearest centroids'
 *    cells, cutting the candidate set by ~|centroids|/nProbe. At
 *    100 TB the cell assignment is also the physical partitioning key,
 *    so a probe touches only matching partitions.
 *  - [[nearDupPairs]]: embedding-cosine near-duplicate pairs above a
 *    threshold (brute force N²/2 — LSH/IVF-bucketed candidate
 *    generation is the scale variant, same verify stage).
 *
 * Determinism: ordering ties break on ascending id; cosines are
 * computed in double on both the Spark and the DuckDB oracle side.
 */
object Similarity {

  /** Cosine similarity of two `array<double>` columns (sequential
    * left-to-right folds — bit-reproducible). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /**
   * Exact cosine top-k: for each row of `queries` (vec_id, embedding),
   * the k nearest rows of `corpus` (excluding the query itself).
   * Returns (query_id, neighbor_id, rank, cos).
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int = 5): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("q_emb")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("c_emb"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /**
   * IVF-style approximate top-k: `centroids` partition the corpus into
   * cells (nearest-centroid assignment); each query searches only the
   * cells of its `nProbe` nearest centroids. Same output shape as
   * [[bruteForceTopK]]; recall < 1 by design.
   */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      k: Int = 5,
      nProbe: Int = 3): DataFrame = {
    val cent = broadcast(centroids.select(col("vec_id").as("cid"),
      asDouble(col("embedding")).as("cent_emb")))

    // nearest-centroid assignment of every corpus vector: broadcast
    // join + ranking, no N×N work
    val wAssign = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("cos_c").desc, col("cid"))
    val assigned = corpus
      .select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("c_emb"))
      .crossJoin(cent)
      .withColumn("cos_c", cosine(col("c_emb"), col("cent_emb")))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col("neighbor_id"), col("c_emb"), col("cid"))

    // probe list: nProbe nearest centroids per query
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_p").desc, col("cid"))
    val probes = queries
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("q_emb"))
      .crossJoin(cent)
      .withColumn("cos_p", cosine(col("q_emb"), col("cent_emb")))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cid"))

    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probes)
      .join(assigned, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, id-ordered. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), asDouble(col("embedding")).as("emb_a"))
    val b = corpus.select(col("vec_id").as("id_b"), asDouble(col("embedding")).as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
