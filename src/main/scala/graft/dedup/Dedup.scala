package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * Deduplication operators for training-data pipelines (north-star
 * extension; no reference counterpart). Four families:
 *
 *  - exact: hash-groupBy on a normalized fingerprint — one shuffle on
 *    the 32-char digest, never on the document body;
 *  - MinHash + LSH: per-row signature/banding (codegen'd array
 *    builtins, no UDF, no shuffle), then a shuffle keyed by (band,
 *    bucket) whose width is the collision count, not N²;
 *  - SimHash: per-row 32-bit signature + banded candidate join; with
 *    4 bands, hamming ≤ 3 detection is exact (pigeonhole);
 *  - exact n-gram Jaccard: inverted-index join on distinct shingles.
 *
 * Scale posture: every candidate-generation path shuffles on a short
 * hash key; document text never enters a shuffle except to verify the
 * (tiny) candidate set. Hash functions are md5-based so every stage
 * has an exact DuckDB twin for the oracle gate.
 */
object Dedup {

  /** Word n-gram shingles (default 3), empty array when the document
    * has fewer than n tokens. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = TextFunctions.wsTokens(text)
    val count = size(toks) - (n - 1)
    when(count <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), count), i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** MinHash signature: k independent permutations simulated as
    * `min(md5(h || ':' || shingle))` in hex-string order — string mins
    * are engine-portable (no integer hash needed). Null signature for
    * shingle-less docs. */
  def minhashSignature(shingles: Column, k: Int = 12): Column =
    when(size(shingles) === 0, lit(null).cast("array<string>"))
      .otherwise(transform(sequence(lit(0), lit(k - 1)),
        h => array_min(transform(shingles, s => md5(concat(h.cast("string"), lit(":"), s))))))

  /** LSH band digests: `bands` groups of `rows` signature components,
    * each digested to one bucket id. Two docs collide in a band iff
    * that slice of their signatures matches exactly. */
  def lshBands(sig: Column, bands: Int = 4, rows: Int = 3): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => md5(concat_ws("", slice(sig, j * lit(rows) + 1, lit(rows)))))

  /** Candidate pairs from band collisions: explode (band_idx, bucket),
    * self-join, dedupe. Input must carry `doc_id` and `bands`. */
  def bandCandidates(withBands: DataFrame): DataFrame = {
    val exploded = withBands
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "bucket")))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard between two shingle arrays, on distinct shingles:
    * |A∩B| / (|A| + |B| − |A∩B|). */
  def jaccard(a: Column, b: Column): Column = {
    val ni = size(array_intersect(a, b)).cast("double")
    val na = size(array_distinct(a))
    val nb = size(array_distinct(b))
    ni / (na + nb - ni)
  }

  /**
   * MinHash-LSH near-duplicate pairs over `(doc_id, text)`:
   * signature → bands → collision candidates → exact-Jaccard verify.
   * Returns (doc_a, doc_b, jaccard) for pairs with J ≥ threshold.
   */
  def minhashNearDups(
      docs: DataFrame,
      threshold: Double = 0.6,
      k: Int = 12,
      bands: Int = 4,
      rows: Int = 3): DataFrame = {
    val shingled = docs.select(
      col("doc_id"),
      wordShingles(col("text")).as("shingles"))
    val withBands = shingled
      .where(size(col("shingles")) > 0)
      .withColumn("bands", lshBands(minhashSignature(col("shingles"), k), bands, rows))
    val cands = bandCandidates(withBands)
    cands
      .join(shingled.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shingled.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sa.shingles"), col("sb.shingles")).as("j"))
      .where(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
  }

  /** 32-bit SimHash over whitespace tokens (with multiplicity): bit b
    * of the signature is set iff Σ_tokens (±1 by bit b of
    * md5-first-8-hex) is positive. Built from conv() — codegen'd, with
    * a strpos-based DuckDB twin. */
  /** Bit b of a non-negative long below 2^52, as portable arithmetic
    * (shift builtins take only literal shift amounts, and the DuckDB
    * twin uses the same floor/power form — exact in double for our
    * 32-bit values). */
  private def bitAt(h: Column, b: Column): Column =
    floor(h / pow(lit(2.0), b)).cast("long") % 2

  def simhash32(text: Column): Column = {
    val toks = TextFunctions.wsTokens(text)
    // per-token 32-bit value from the first 8 md5 hex chars
    val hashes = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val bits = sequence(lit(0), lit(31))
    aggregate(
      bits,
      lit(0L),
      (acc, b) => {
        val bitSum = aggregate(hashes, lit(0L),
          (s, h) => s + when(bitAt(h, b) === 1, 1L).otherwise(-1L))
        acc + when(bitSum > 0, pow(lit(2.0), b).cast("long")).otherwise(0L)
      })
  }

  /** SimHash near-duplicate pairs: 4 bands of 8 bits generate
    * candidates (exact for hamming ≤ 3), verified with
    * bit_count(xor). Returns (doc_a, doc_b, hamming ≤ maxHamming). */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash32(col("text")).as("sig"))
    val banded = sigs.withColumn("bands",
      transform(sequence(lit(0), lit(3)),
        j => floor(col("sig") / pow(lit(2.0), j * 8)).cast("long") % 256))
    val exploded = banded
      .select(col("doc_id"), col("sig"), posexplode(col("bands")).as(Seq("band_idx", "bucket")))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /**
   * Exact n-gram Jaccard near-dups via inverted index: explode
   * DISTINCT shingles, self-join on the shingle (the shuffle key is
   * the shingle hash, so co-occurrence is computed where the data
   * lives), count intersections per pair, recover the union from
   * per-doc distinct counts. No approximation.
   */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val shingled = docs
      .select(col("doc_id"), array_distinct(wordShingles(col("text"))).as("shingles"))
      .where(size(col("shingles")) > 0)
    val counts = shingled.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val inv = shingled.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val pairs = inv.as("a")
      .join(inv.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("ni"))
    pairs
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("j",
        col("ni").cast("double") / (col("ca.n_sh") + col("cb.n_sh") - col("ni")))
      .where(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
  }

  /** Exact dedup: canonical = min doc_id sharing the normalized
    * fingerprint. Per-doc output (doc_id, fingerprint, canonical_id,
    * is_dup). One shuffle on the digest. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"),
      TextFunctions.normalizedFingerprint(col("text")).as("fingerprint"))
    val canon = fp.groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("canonical_id"))
    fp.join(canon, Seq("fingerprint"))
      .select(col("doc_id"), col("fingerprint"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
  }
}
