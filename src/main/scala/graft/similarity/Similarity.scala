package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`) —
 * north-star extension (BASELINE.json), no reference counterpart.
 *
 * All scoring paths pre-normalize vectors (codegen'd inline norm — see
 * [[normalized]]), so each scored pair costs exactly one 64-element
 * dot product. Operators:
 *
 *  - [[bruteForceTopK]]: exact top-k for a (small) query set against
 *    the full corpus: broadcast the queries, one scan of the corpus,
 *    per-query ranking window. O(|Q|·N), the corpus side streams;
 *  - [[ivfTopK]]: the scale path. A fixed centroid set partitions the
 *    corpus (assignment = one broadcast join, computed where the data
 *    lives); a query probes only its `nProbe` nearest centroids'
 *    cells. At 100 TB the cell id doubles as the physical partition
 *    key so a probe touches only matching partitions;
 *  - [[nearDupPairs]]: cosine ≥ threshold pairs (brute force N²/2;
 *    LSH/IVF-bucketed candidates are the scale variant, same verify).
 *
 * Determinism: ties order by ascending id; all arithmetic is double.
 */
object Similarity {

  /** Sequential left-to-right dot product of two array<double>
    * columns (bit-reproducible fold, mirrored in the DuckDB oracle). */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** Codegen'd dot product via the native [[graft.functions.DotProduct]]
    * expression — same value and addition order as [[dot]], ~10× per
    * call on the N² pair-scoring paths. Requires [[ensureRegistered]]
    * on the session (operators below do it). */
  def fastDot(x: Column, y: Column): Column = call_function("graft_dot", x, y)

  private def ensureRegistered(df: DataFrame): Unit =
    graft.functions.GraftFunctions.register(df.sparkSession)

  /** Cosine similarity of two unnormalized vectors (one-off use; the
    * operators below pre-normalize instead). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def parallelize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val n = scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    df.repartition(n)
  }

  /** (id, emb) with emb cast to double and scaled to unit norm. The
    * norm is the codegen'd [[fastDot]] written INSIDE the divide lambda:
    * projection collapse re-evaluates it per element, but that is 64
    * extra primitive flops per element — orders of magnitude cheaper
    * than the exchange-plus-checkpoint barrier it replaces (the original
    * concern was the interpreted HOF norm, where per-element re-eval
    * was 64× an allocation-heavy lambda chain). `spread` repartitions
    * corpus-sized inputs for the CPU-bound scoring that follows; query/
    * centroid frames skip it (they broadcast anyway). */
  private def normalized(
      df: DataFrame, idOut: String, embOut: String, spread: Boolean = true): DataFrame = {
    ensureRegistered(df)
    val base = if (spread) parallelize(df) else df
    val emb = col("embedding").cast("array<double>")
    base.select(col("vec_id").as(idOut),
      transform(emb, x => x / sqrt(call_function("graft_dot", emb, emb))).as(embOut))
  }

  /**
   * Exact cosine top-k: for each row of `queries` (vec_id, embedding),
   * the k nearest rows of `corpus` (excluding the query itself).
   * Returns (query_id, neighbor_id, rank, cos).
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int = 5): DataFrame = {
    ensureRegistered(queries)
    val q = broadcast(normalized(queries, "query_id", "q_emb", spread = false))
    val c = normalized(corpus, "neighbor_id", "c_emb")
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", fastDot(col("q_emb"), col("c_emb")))
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
    ensureRegistered(queries)
    val cent = broadcast(normalized(centroids, "cid", "cent_emb", spread = false))

    val wAssign = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("cos_c").desc, col("cid"))
    val assigned = normalized(corpus, "neighbor_id", "c_emb")
      .crossJoin(cent)
      .withColumn("cos_c", fastDot(col("c_emb"), col("cent_emb")))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col("neighbor_id"), col("c_emb"), col("cid"))

    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_p").desc, col("cid"))
    val probes = normalized(queries, "query_id", "q_emb", spread = false)
      .crossJoin(cent)
      .withColumn("cos_p", fastDot(col("q_emb"), col("cent_emb")))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cid"))

    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probes)
      .join(assigned, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", fastDot(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /**
   * Deterministic spherical k-means centroid training for IVF: seed
   * with `vec_id % (N/k)`-style fixed picks (caller supplies the seed
   * frame), then `iters` Lloyd rounds — assign by cosine (ties to the
   * lowest centroid id), recompute each centroid as the re-normalized
   * element-wise mean of its members, components rounded to 6 decimals
   * so runs are reproducible across platforms. Returns (cid,
   * embedding) ready to feed [[ivfTopK]]. Everything is DataFrame ops:
   * posexplode → per-(cid, pos) mean → re-packed ordered array; each
   * round is one broadcast join + two aggregations.
   */
  def kmeansCentroids(corpus: DataFrame, seeds: DataFrame, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    ensureRegistered(corpus)
    // reused every Lloyd round — one eager checkpoint, read iters times
    val vecs = normalized(corpus, "vid", "emb").localCheckpoint(eager = true)
    // Centroids are O(k) — genuinely driver-sized state (MLlib's KMeans
    // holds them on the driver too). Keeping them local turns each
    // Lloyd round into ONE distributed job (assign + per-dimension
    // mean, collected), with no per-round checkpoint/coalesce machinery.
    var cents: Array[(Long, Seq[Double])] = normalized(seeds, "cid", "cent_emb", spread = false)
      .select(col("cid").cast("long"), col("cent_emb"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    (0 until iters).foreach { _ =>
      val centDf = broadcast(cents.toSeq.toDF("cid", "cent_emb"))
      val wAssign = Window.partitionBy(col("vid")).orderBy(col("cos_c").desc, col("cid"))
      val meaned = vecs.crossJoin(centDf)
        .withColumn("cos_c", fastDot(col("emb"), col("cent_emb")))
        .withColumn("rn", row_number().over(wAssign))
        .where(col("rn") === 1)
        .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("mean_emb"))
        .select(col("cid").cast("long"), col("mean_emb"))
        .as[(Long, Seq[Double])].collect()
      cents = meaned.map { case (cid, mean) =>
        // same arithmetic as the distributed form: left-to-right
        // sum-of-squares, then HALF_UP rounding of each component
        val nrm = math.sqrt(mean.foldLeft(0.0)((acc, v) => acc + v * v))
        val unit = mean.map(v => BigDecimal(v / nrm)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        (cid, unit)
      }.sortBy(_._1)
    }
    cents.toSeq.toDF("vec_id", "embedding")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, id-ordered.
    * The left side is repartitioned (parallel outer loop); the right
    * side broadcasts inside the nested-loop join. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    ensureRegistered(corpus)
    val a = normalized(corpus, "id_a", "emb_a")
    val b = broadcast(normalized(corpus, "id_b", "emb_b", spread = false))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", fastDot(col("emb_a"), col("emb_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
