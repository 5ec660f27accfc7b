package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sketch operators expressed as PURE relational algebra — no custom
 * state, no approximate-library dependency, and (deliberately) no
 * randomness: given the hash function, every register value and the
 * final estimate are deterministic, so the correctness gate can
 * hash-compare the ESTIMATE itself against an independent DuckDB
 * implementation instead of settling for a tolerance check (the
 * reason `approx_count_distinct` can't be gate-tested).
 */
object Sketches {

  /**
   * HyperLogLog distinct count (Flajolet et al. 2007) over a string
   * key, with the small-range linear-counting correction:
   *
   *  - 128 md5 bits per key split into two 32-bit words (the repo's
   *    portable-hash discipline: every derived value stays below
   *    2^63, lesson 8); bucket = top p bits of the hi word, and the
   *    rank input v = the remaining (32−p)+32 = (64−p) bits, built by
   *    exact integer arithmetic `(hi mod 2^(32−p))·2^32 + lo`.
   *  - rho = (64−p) + 1 − bitlen(v), with bitlen via
   *    `length(bin(v))` — bin() strips leading zeros identically on
   *    both engines, so the rank is integer-exact; v = 0 → all bits
   *    zero → rho = (64−p)+1.
   *  - registers: `max(rho)` per bucket — a partial-combined
   *    aggregate whose exchange carries AT MOST m rows however large
   *    the input (the whole point of HLL at 100 TB: distinct-count
   *    with an m-row shuffle instead of a distinct shuffle of the
   *    keys themselves).
   *  - harmonic sum: Σ 2^(−M_j) is summed as the EXACT integers
   *    2^(SCALE−M_j) in DECIMAL (each term is an exact power of two;
   *    summing them in double would round order-dependently once
   *    register spans exceed the 53-bit mantissa), empty buckets
   *    contributing 2^SCALE each; the one double rounding is the
   *    final CAST of the decimal sum, identical on both engines.
   *  - estimate: alpha·m²·2^SCALE / S, with the standard m<128 alpha
   *    constants, then the small-range branch `m·ln(m/V)` when
   *    E ≤ 2.5m and empty buckets remain (the single ln call carries
   *    the same measured last-ulp exposure as t8/m2 — absorbed by
   *    ROUND(,6)).
   *
   * Returns ONE row: (n_exact, n_buckets_used, hll_estimate6) —
   * n_exact is the exact distinct count, kept as the audit column
   * (at gate SF both are cheap; at 100 TB the exact column is the
   * one you'd drop).
   */
  def hllDistinct(df: DataFrame, key: Column, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 12, s"hll: p must be in [4, 12]: $p")
    val nExact = df.agg(countDistinct(key.cast("string")).as("n")).select(col("n"))
    hllEstimate(hllRegisters(df, key, p), p).crossJoin(nExact)
      .select(col("n").as("n_exact"),
        col("used").as("n_buckets_used"),
        round(col("est"), 6).as("hll_estimate6"))
  }

  /**
   * HLL REGISTER UNION — the mergeability that makes HLL a lake
   * primitive (the hl1 counterpart of [[kmvUnionJaccard]]): registers
   * built independently per slice compose by per-bucket MAX, and the
   * estimate over the merged registers equals the estimate over the
   * union — exactly, not approximately, because a register is the max
   * rank seen and max is associative. Each side's register frame is
   * its own at-most-m-row aggregate; the merge exchanges ≤2m rows.
   * Returns one row: (n_union_exact, n_buckets_used, hll_union_est6)
   * — the exact column is the 100 TB drop-me audit, as in hl1.
   */
  def hllUnion(dfA: DataFrame, dfB: DataFrame, key: Column, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 12, s"hll: p must be in [4, 12]: $p")
    val regs = hllRegisters(dfA, key, p).unionByName(hllRegisters(dfB, key, p))
      .groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
    val nExact = dfA.select(key.cast("string").as("t"))
      .unionByName(dfB.select(key.cast("string").as("t")))
      .agg(countDistinct(col("t")).as("n"))
    hllEstimate(regs, p).crossJoin(nExact)
      .select(col("n").as("n_union_exact"),
        col("used").as("n_buckets_used"),
        round(col("est"), 6).as("hll_union_est6"))
  }

  /**
   * Per-GROUP HLL distinct counts — the shape a 100 TB rollup
   * actually wants ("distinct users per event type / domain / day"):
   * one register frame keyed on (group, bucket) — at most m rows PER
   * GROUP, partial-combined, so the exchange carries
   * O(groups · m) regardless of row count — then the hl1 estimate
   * formula applied per group (identical DECIMAL-exact harmonic sum
   * and small-range branch, so the oracle is hl1's SQL with a GROUP
   * BY). Output one row per group: (grp, n_exact, n_buckets_used,
   * hll_estimate6); the exact column is the drop-at-scale audit, as
   * in hl1. Groups with few members ride the small-range linear-
   * counting branch — still engine-exact.
   */
  def hllDistinctBy(
      df: DataFrame, group: Column, key: Column, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 12, s"hll: p must be in [4, 12]: $p")
    val nExact = df.groupBy(group.as("grp"))
      .agg(countDistinct(key.cast("string")).as("n_exact"))
    // eqNullSafe: a null group key survives both groupBys as its own
    // group; a plain equi-join would silently drop it here (null keys
    // never match), losing the "ungrouped" rows from the output.
    val est = hllEstimate(hllRegisters(df, key, p, group = Some(group)),
      p, grouped = true)
      .select(col("grp"), col("used").as("n_buckets_used"),
        round(col("est"), 6).as("hll_estimate6"))
    est.join(nExact, est("grp") <=> nExact("grp"))
      .select(est("grp"), col("n_exact"), col("n_buckets_used"),
        col("hll_estimate6"))
  }

  /** (bucket, reg) register frame — max rank per bucket, the
    * at-most-m-row aggregate [[hllDistinct]], [[hllUnion]] and (per
    * group) [[hllDistinctBy]] build from. */
  private def hllRegisters(
      df: DataFrame, key: Column, p: Int,
      group: Option[Column] = None): DataFrame = {
    val vbits = 64 - p          // rank-input width
    val fp = md5(key.cast("string"))
    val hi = conv(substring(fp, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(fp, 9, 8), 16, 10).cast("long")
    val bucket = floor(hi / lit(1L << (32 - p))).cast("long")
    val v = pmod(hi, lit(1L << (32 - p))) * lit(4294967296L) + lo
    val rho = when(v === 0, lit(vbits + 1))
      .otherwise(lit(vbits + 1) - length(bin(v)))
    group match {
      case Some(g) =>
        df.select(g.as("grp"), bucket.as("bucket"), rho.as("rho"))
          .groupBy(col("grp"), col("bucket"))
          .agg(max(col("rho")).as("reg"))
      case None =>
        df.select(bucket.as("bucket"), rho.as("rho"))
          .groupBy(col("bucket"))
          .agg(max(col("rho")).as("reg"))
    }
  }

  /** One-row (used, est) frame from a register frame — the
    * DECIMAL-exact harmonic sum and the small-range branch (see
    * [[hllDistinct]] scaladoc). */
  private def hllEstimate(
      regs: DataFrame, p: Int, grouped: Boolean = false): DataFrame = {
    val m = 1 << p
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    val scale = (64 - p) + 2    // > max register value, keeps terms >= 1
    val sPresent =
      sum(pow(lit(2.0), lit(scale) - col("reg")).cast("decimal(38,0)")).as("s_present")
    val used = count(lit(1)).as("used")
    val summed =
      if (grouped) regs.groupBy(col("grp")).agg(sPresent, used)
      else regs.agg(sPresent, used)
    val sAll = (col("s_present")
      + (lit(m) - col("used")).cast("decimal(38,0)")
        * lit(math.pow(2.0, scale)).cast("decimal(38,0)")).cast("double")
    // op sequence mirrored verbatim in the oracle: alpha·m·m·2^scale/S
    val eRaw = lit(alpha) * lit(m) * lit(m) * lit(math.pow(2.0, scale)) / sAll
    val est = when(eRaw <= lit(2.5 * m) && col("used") < m,
        lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("used"))))
      .otherwise(eRaw)
    if (grouped) summed.select(col("grp"), col("used"), est.as("est"))
    else summed.select(col("used"), est.as("est"))
  }

  private def hash32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** The k smallest DISTINCT 32-bit md5 hashes of `key` — a KMV
    * (k-minimum-values / bottom-k) sketch frame of ≤k rows. The
    * distinct is a hash-only exchange (8-byte rows, never the keys
    * themselves) and the bottom-k is sort+limit —
    * TakeOrderedAndProject, per-partition heaps of k, no global
    * sort. */
  private def kmvSketch(df: DataFrame, key: Column, k: Int): DataFrame =
    df.select(hash32(key).as("h")).distinct().orderBy(col("h")).limit(k)

  /**
   * KMV distinct-count estimate (Bar-Yossef et al. 2002; the
   * bottom-k sketch): E = (k−1)·U / h_(k) with U = 2^32 and h_(k)
   * the k-th smallest distinct hash; fewer than k distinct values →
   * the sketch IS the exact answer. Like [[hllDistinct]], everything
   * is deterministic given md5, so the gate hash-compares the
   * estimate itself. Returns one row:
   * (n_exact, k_used, kmv_estimate6).
   */
  def kmvDistinct(df: DataFrame, key: Column, k: Int = 32): DataFrame = {
    require(k >= 2, s"kmv: k must be >= 2: $k")
    val agg = kmvSketch(df, key, k).agg(
      count(lit(1)).as("k_used"), max(col("h")).as("kth"))
    val nExact = df.agg(countDistinct(key.cast("string")).as("n_exact"))
    val est = when(col("k_used") < k, col("k_used").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / col("kth").cast("double"))
    agg.crossJoin(nExact)
      .select(col("n_exact"), col("k_used"), round(est, 6).as("kmv_estimate6"))
  }

  /**
   * KMV SET OPERATIONS — the property that makes bottom-k sketches a
   * data-lake primitive: two sketches built independently (per
   * partition, per day, per source) COMPOSE. The union sketch is the
   * bottom-k of the merged sketches (2k rows in, k out — never the
   * data); the Jaccard estimate is the fraction of the union sketch
   * present in BOTH input sketches (Beyer et al. 2007), and the
   * intersection estimate is Jaccard × union. All arithmetic is
   * integer comparisons plus two divisions — deterministic,
   * gate-comparable. Exact audit columns ride along (the columns a
   * 100 TB deployment drops). Returns one row: (n_union_exact,
   * n_inter_exact, k_used, union_est6, jaccard6, inter_est6).
   */
  def kmvUnionJaccard(
      dfA: DataFrame, dfB: DataFrame, key: Column, k: Int = 32): DataFrame = {
    require(k >= 2, s"kmv: k must be >= 2: $k")
    val sA = graft.Materialize.barrier(kmvSketch(dfA, key, k))
    val sB = graft.Materialize.barrier(kmvSketch(dfB, key, k))
    val u = graft.Materialize.barrier(
      sA.unionByName(sB).distinct().orderBy(col("h")).limit(k))
    val uAgg = u.agg(count(lit(1)).as("k_used"), max(col("h")).as("kth"))
    val cAgg = u.join(sA, Seq("h"), "left_semi").join(sB, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("c"))
    val exUnion = dfA.select(key.cast("string").as("t"))
      .unionByName(dfB.select(key.cast("string").as("t")))
      .agg(countDistinct(col("t")).as("n_union_exact"))
    val exInter = dfA.select(key.cast("string").as("t")).distinct()
      .intersect(dfB.select(key.cast("string").as("t")).distinct())
      .agg(count(lit(1)).as("n_inter_exact"))
    val unionEst = when(col("k_used") < k, col("k_used").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / col("kth").cast("double"))
    val jacc = col("c").cast("double") / col("k_used")
    uAgg.crossJoin(cAgg).crossJoin(exUnion).crossJoin(exInter)
      .select(col("n_union_exact"), col("n_inter_exact"), col("k_used"),
        round(unionEst, 6).as("union_est6"),
        round(jacc, 6).as("jaccard6"),
        round(jacc * unionEst, 6).as("inter_est6"))
  }

  /**
   * Count-min sketch (Cormode & Muthukrishnan 2005) over the token
   * stream, audited against exact counts: two hash rows of `width`
   * counters (the two independent 32-bit words of each token's md5 —
   * the hl1/simhash64 split-word discipline), estimate = min over
   * rows, which can only OVERESTIMATE (collisions add, never
   * subtract) — `never_under` asserts the guarantee row by row.
   * Returns the `topK` tokens by exact count (count DESC, token —
   * v1's deterministic ordering) with (token, n_exact, cm_est,
   * never_under). All counts are integers — the whole result is
   * hash-exact cross-engine.
   *
   * Scale shape: the sketch side is two partial-combined aggregates
   * whose exchanges carry AT MOST `width` rows each, however large
   * the corpus — the frequency-estimation analogue of hl1's
   * at-most-m-row distinct shape. The exact side (one token-keyed
   * aggregate feeding TakeOrderedAndProject) is the audit a
   * production deployment replaces WITH the sketch.
   */
  def countMinTopTokens(
      docsDf: DataFrame, width: Int = 512, topK: Int = 10): DataFrame = {
    require(width >= 2, s"countmin: width must be >= 2: $width")
    val toks = docsDf.select(
      explode(graft.functions.TextFunctions.wsTokens(lower(col("text")))).as("t"))
    val lo = conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long")
    val hi = conv(substring(md5(col("t")), 9, 8), 16, 10).cast("long")
    val hashed = toks.select(col("t"),
      (lo % width).as("b1"), ((hi % 2147483648L) % width).as("b2"))
    // aggregate BEFORE the barrier (guide §2.3, the ir1 pattern; the
    // r20 "not yet optimized" cm1 item): all three consumers — both
    // sketch rows and the exact audit — are functions of the
    // PER-TOKEN counts, so one map-side-combined groupBy replaces the
    // checkpoint of every token OCCURRENCE (the corpus token stream)
    // with a checkpoint of the distinct-token table, and the sketch
    // rows become tiny sums over it (b1/b2 are functions of t, so
    // grouping by them too changes nothing). Identical integers:
    // c1 = Σ_{t: b1(t)=x} n_exact(t) IS bucket x's occurrence count.
    val tok = graft.Materialize.barrier(
      hashed.groupBy(col("t"), col("b1"), col("b2"))
        .agg(count(lit(1)).as("n_exact")))
    val row1 = tok.groupBy(col("b1")).agg(sum(col("n_exact")).as("c1"))
    val row2 = tok.groupBy(col("b2")).agg(sum(col("n_exact")).as("c2"))
    val top = tok.orderBy(col("n_exact").desc, col("t")).limit(topK)
    top.join(broadcast(row1), Seq("b1")).join(broadcast(row2), Seq("b2"))
      .select(col("t").as("token"), col("n_exact"),
        least(col("c1"), col("c2")).as("cm_est"),
        (least(col("c1"), col("c2")) >= col("n_exact")).as("never_under"))
  }

  /**
   * Deterministic QUANTILE sketch — the family member hl1/sk1/cm1
   * leave open: approximate quantiles from a bottom-k-BY-HASH row
   * sample. Rows whose md5(key) ranks in the smallest `k` form a
   * uniform without-replacement sample (deterministic given md5 — the
   * repo's no-randomness sketch discipline, so the gate hash-compares
   * the ESTIMATES), and the estimate for quantile q is the exact
   * nearest-rank pick `rank = ceil(q·k_used)` over the sample —
   * always a REAL data value, no interpolation (the rs3/rs4 rule that
   * keeps quantiles portable). Error is the uniform-sample bound
   * O(1/√k) on the rank, independent of data size.
   *
   * MERGEABLE like sk2: the sample of a union is the bottom-k of the
   * merged samples (k rows per slice through any combine), which is
   * why this beats Spark's `percentile_approx` for lake rollups the
   * gate must check exactly: GK/KLL sketches are
   * implementation-defined, this is pinned arithmetic.
   *
   * Scale shape: the sample is sort+limit on the 8-byte hash —
   * TakeOrderedAndProject, per-partition heaps of k, no global sort;
   * the rank window runs over ≤k rows (the bm1 harmless tail). The
   * exact audit columns compute each quantile as max-of-top-rank
   * (per-partition heaps again, but rank-sized) — the columns a
   * 100 TB deployment DROPS, exactly like hl1's n_exact.
   *
   * Ties: sample selection orders by (h, v), rank picks by (v, h) —
   * both total orders, so every pick is engine-portable. The exact
   * side orders by (v, key): key is unique, total order again.
   */
  def kmvQuantiles(
      df: DataFrame, key: Column, value: Column,
      k: Int = 256, qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      exactAudit: Boolean = true): DataFrame = {
    require(k >= 2, s"kmv quantiles: k must be >= 2: $k")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"kmv quantiles: qs must be in (0, 1]: $qs")
    val spark = df.sparkSession
    val n = df.count()
    val sample = graft.Materialize.barrier(
      df.select(hash32(key).as("h"), value.cast("double").as("v"))
        .orderBy(col("h"), col("v")).limit(k))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("h"))
    val ranked = sample
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(sample.agg(count(lit(1)).as("k_used"))))
    // Label carries the full decimal (0.345 -> p34_5), so nearby
    // quantiles never collapse to one column name; integral percents
    // keep their p50/p90/p99 form.
    def pct(q: Double): String =
      (BigDecimal(q) * 100).bigDecimal.stripTrailingZeros
        .toPlainString.replace('.', '_')
    require(qs.map(pct).distinct.size == qs.size,
      s"kmv quantiles: duplicate qs produce colliding column labels: $qs")
    val estAgg = ranked.agg(
      max(col("k_used")).as("k_used"),
      qs.map(q => max(when(
          col("rn") === ceil(lit(q) * col("k_used")).cast("long"), col("v")))
        .as(s"p${pct(q)}_est")): _*)
    val nRow = spark.range(1).select(lit(n).as("n_rows"))
    if (!exactAudit)
      // production form: the audit's rank-sized top-r heaps (p99 ≈ a
      // near-full copy per partition) are exactly what a 100 TB
      // deployment drops — the sketch side alone is hash-heap-of-k
      return nRow.crossJoin(estAgg)
        .select(col("n_rows") +: col("k_used") +:
          qs.map(q => round(col(s"p${pct(q)}_est"), 6).as(s"p${pct(q)}_est")): _*)
    // exact audit per q: the rank-r smallest in (v, key) order is the
    // max over the top-r limit — TakeOrderedAndProject, heap of r
    val exacts = qs.map { q =>
      val r = math.ceil(q * n.toDouble).toLong
      require(r <= Int.MaxValue,
        s"kmv quantiles exact audit: rank $r for q=$q exceeds limit()'s " +
          "Int range — run with exactAudit=false above ~2.1B rows " +
          "(the audit columns are the drop-at-scale pattern anyway)")
      df.select(value.cast("double").as("v"), key.as("kk"))
        .orderBy(col("v"), col("kk")).limit(r.toInt)
        .agg(max(col("v")).as(s"p${pct(q)}_exact"))
    }
    exacts.foldLeft(nRow.crossJoin(estAgg))((acc, e) => acc.crossJoin(e))
      .select(col("n_rows") +: col("k_used") +:
        qs.flatMap(q => Seq(
          round(col(s"p${pct(q)}_exact"), 6).as(s"p${pct(q)}_exact"),
          round(col(s"p${pct(q)}_est"), 6).as(s"p${pct(q)}_est"))): _*)
  }
}
