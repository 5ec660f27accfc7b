package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-9 analytics additions: ordered funnel
  * (fn1), weighted median (wm1), MAD outlier screen (rz1), customer
  * order-count distribution (q13), and the binary→float rerank
  * cascade (e4). The correctness gate hash-checks each against its
  * DuckDB twin at sf0.01; these tests pin the SEMANTIC corners the
  * gate's fixed data may not exercise (tie order, zero-weight edge,
  * robust-fence behavior, cascade containment). */
class AnalyticsSpec extends AnyFunSuite with SparkTestBase {

  private def eventsDf(rows: Seq[(Long, java.sql.Timestamp, Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_id", "event_type")
  }

  test("funnel: stages must be reached in order; same-ts ties resolve by event_id") {
    import spark.implicits._
    // A: click BEFORE first view must not count; later click does;
    //    purchase without signup must not count
    // B: view only
    // C: click at the SAME ts as the view, larger event_id → counts
    // D: click at the SAME ts as the view, SMALLER event_id → does not
    val rows = Seq(
      (1L, day(0), 1L, "click"), (1L, day(1), 2L, "view"),
      (1L, day(2), 3L, "click"), (1L, day(3), 4L, "purchase"),
      (2L, day(0), 5L, "view"),
      (3L, day(0), 6L, "view"), (3L, day(0), 7L, "click"),
      (3L, day(1), 8L, "signup"), (3L, day(2), 9L, "purchase"),
      (4L, day(0), 10L, "click"), (4L, day(0), 11L, "view"))
    val got = graft.queries.TemporalQueries
      .funnel(eventsDf(rows), Seq("view", "click", "signup", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 4L, "click" -> 2L, "signup" -> 1L, "purchase" -> 1L))
  }

  test("funnel: rejects empty and duplicate stage lists") {
    intercept[IllegalArgumentException] {
      graft.queries.TemporalQueries.funnel(eventsDf(Seq()), Seq())
    }
    intercept[IllegalArgumentException] {
      graft.queries.TemporalQueries.funnel(eventsDf(Seq()), Seq("a", "a"))
    }
  }

  test("weighted median: cumulative-weight pick, not an interpolating quantile") {
    import spark.implicits._
    // weights drag the median to the heavy value
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0))
      .toDF("grp", "v", "w")
    val got = graft.queries.Relational.weightedMedian(df, "grp", "v", "w")
      .select("weighted_median", "total_weight")
      .as[(Double, Double)].collect().head
    assert(got == ((3.0, 12.0)))
    // exact half boundary: cum(1.0) = 1 >= 2/2 → the LOWER value wins
    val even = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0)).toDF("grp", "v", "w")
    val got2 = graft.queries.Relational.weightedMedian(even, "grp", "v", "w")
      .select("weighted_median").as[Double].collect().head
    assert(got2 == 1.0)
  }

  test("MAD outliers: robust fence flags the spike a mean/stddev fence absorbs") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex
      .map { case (v, i) => ("s1", day(i), i.toLong, Some(v)) }
      .toDF("series_id", "ts", "event_id", "value")
    val got = graft.queries.TimeSeriesQueries.madOutliers(df)
      .select("n_values", "med6", "mad6", "n_outliers", "max_dev6")
      .as[(Long, Double, Double, Long, Double)].collect().head
    // sorted [1,2,3,4,100]: med = 3; devs sorted [0,1,1,2,97]: mad = 1
    assert(got == ((5L, 3.0, 1.0, 1L, 97.0)))
    // classic failure of the z-score fence on the same data: stddev is
    // ~43, so |100 − mean| ≈ 78 < 3σ — the spike hides itself. MAD
    // flags it. (Computed here to document WHY the operator exists.)
    val vs = Seq(1.0, 2.0, 3.0, 4.0, 100.0)
    val mean = vs.sum / vs.length
    val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / (vs.length - 1))
    assert(math.abs(100.0 - mean) < 3 * sd)
  }

  test("MAD outliers: even count uses the same (a+b)/2 pick as rs3") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 4.0, 8.0).zipWithIndex
      .map { case (v, i) => ("s1", day(i), i.toLong, Some(v)) }
      .toDF("series_id", "ts", "event_id", "value")
    val got = graft.queries.TimeSeriesQueries.madOutliers(df)
      .select("med6", "mad6").as[(Double, Double)].collect().head
    // med = (2+4)/2 = 3; devs sorted [1,2,1,5]→[1,1,2,5]: mad = (1+2)/2
    assert(got == ((3.0, 1.5)))
  }

  test("q13: left-outer keeps zero-order customers; distribution mass is conserved") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val dist = graft.queries.Relational.q13CustomerDistribution(spark, dir)
      .as[(Long, Long)].collect().toMap
    val nCustomers = graft.sources.Tables.read(spark, dir, "customer").count()
    val nOrders = graft.sources.Tables.read(spark, dir, "orders")
      .join(graft.sources.Tables.read(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(dist.values.sum == nCustomers)
    assert(dist.map { case (c, d) => c * d }.sum == nOrders)
  }

  test("qs1 yield curve: monotone in the threshold, exhaustive at zero") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.TextAnalysis.qs1QualityYield(spark, dir)
      .orderBy("thr10")
      .select("thr10", "n_docs_kept", "n_tokens_kept", "docs_frac6")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) == (0L to 9L))
    // quality >= 0 always: threshold 0 keeps the whole corpus
    val nDocs = graft.sources.Tables.read(spark, dir, "documents").count()
    assert(rows.head._2 == nDocs && rows.head._4 == 1.0)
    // raising the threshold can only shrink the kept set
    assert(rows.sliding(2).forall(p => p(0)._2 >= p(1)._2 && p(0)._3 >= p(1)._3))
    // the sweep must actually discriminate on this corpus
    assert(rows.last._2 < nDocs)
  }

  test("fc1 cascade: stage counts are monotone and stage 0 is the corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.TextAnalysis.fc1FilterCascade(spark, dir)
      .orderBy("stage")
      .select("stage", "name", "n_docs", "n_tokens")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(rows.map(_._2) == Seq("all", "lang_en", "quality", "length", "repetition"))
    val nDocs = graft.sources.Tables.read(spark, dir, "documents").count()
    assert(rows.head._3 == nDocs)
    assert(rows.sliding(2).forall(p => p(0)._3 >= p(1)._3 && p(0)._4 >= p(1)._4))
    // at least one stage filters something on this corpus
    assert(rows.last._3 < nDocs)
  }

  test("e4 cascade: reranked ids are a subset of the binary candidates, " +
    "scored exactly like brute force") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.read(spark, dir, "embeddings")
    val q = e.where(col("vec_id") === 17)
    val cand = graft.similarity.Similarity
      .binaryHammingTopK(e, q, topK = 100)
      .select("vec_id").as[Long].collect().toSet
    val got = graft.similarity.Similarity
      .binaryRerankTopK(e, q, candidates = 100, topK = 10)
      .select("vec_id", "cos4", "rank").as[(Long, Double, Int)].collect()
    assert(got.length == 10 && got.map(_._1).toSet.subsetOf(cand))
    assert(!got.map(_._1).contains(17L), "query row must not rerank itself")
    assert(got.sortBy(_._3).map(_._2).sliding(2).forall(p => p(0) >= p(1) - 1e-9),
      "rank order must follow cosine descending")
    intercept[IllegalArgumentException] {
      graft.similarity.Similarity.binaryRerankTopK(e, q, candidates = 5, topK = 10)
    }
  }

  test("multi-query cascade: batched queries reproduce each single-query run exactly") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.read(spark, dir, "embeddings")
    val ids = Seq(17L, 42L, 99L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "rank").as[(Long, Long, Int)]
        .collect().toSet
    val batched = rows(graft.similarity.Similarity.binaryRerankTopK(
      e, e.where(col("vec_id").isin(ids: _*)), candidates = 100, topK = 10))
    val singles = ids.flatMap { id =>
      rows(graft.similarity.Similarity.binaryRerankTopK(
        e, e.where(col("vec_id") === id), candidates = 100, topK = 10))
    }.toSet
    assert(batched == singles && batched.size == 30)
  }

  test("g3 grouping sets: exactly the two marginals, no cross product") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Relational.g3GroupingSets(spark, dir)
    // gid 1 = (status) set, gid 2 = (priority) set; nothing else
    assert(got.select("gid").distinct().as[Long].collect().toSet == Set(1L, 2L))
    val statusRows = got.where(col("gid") === 1)
      .select("o_orderstatus", "n_orders").as[(String, Long)].collect().toMap
    val direct = graft.sources.Tables.read(spark, dir, "orders")
      .groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    assert(statusRows == direct)
  }

  test("w3 yoy: prev_year is the revenue of the month 12 rows back") {
    import spark.implicits._
    val got = graft.queries.Relational.w3YoyGrowth(spark, "/root/testdata/sf0.001")
      .select("month", "revenue", "prev_year")
      .as[(java.sql.Timestamp, Double, Option[Double])].collect().sortBy(_._1.getTime)
    assert(got.take(12).forall(_._3.isEmpty))
    got.drop(12).zip(got).foreach { case ((_, _, prev), (_, rev0, _)) =>
      assert(prev.contains(rev0))
    }
  }

  test("sm3 weighted sample: deterministic, and the keys match a driver replay") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.CorpusQueries.sm3WeightedSample(spark, dir, k = 50)
      .select("doc_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    val again = graft.queries.CorpusQueries.sm3WeightedSample(spark, dir, k = 50)
      .select("doc_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(got.sameElements(again), "no rand(): reruns must agree exactly")
    // driver replay of key = ln((h+1)/2^32)/max(n_chars,1), top-50
    val base = graft.sources.Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect()
    def h32(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
    val expect = base.map { case (id, nc) =>
      (id, math.log((h32(id) + 1).toDouble / 4294967296.0) / math.max(nc, 1L).toDouble)
    }.sortBy { case (id, k) => (-k, id) }.take(50).map(_._1)
    assert(got.map(_._1).sameElements(expect))
  }

  test("q17: filter uses the exact sum/count mean; quantities must stay integer-valued") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Relational.q17SmallQtyRevenue(spark, dir)
      .select("n_items").as[Long].collect().head
    val li = graft.sources.Tables.read(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity")).as[(Long, Double)].collect()
    // the no-rounding portability argument rests on integer weights
    assert(li.forall { case (_, q) => q == math.floor(q) })
    val mean = li.groupBy(_._1).map { case (p, xs) =>
      p -> xs.map(_._2).sum / xs.length
    }
    val expect = li.count { case (p, q) => q < 0.2 * mean(p) }
    assert(got == expect)
  }

  test("q21: per-order aggregate == the literal EXISTS / NOT EXISTS formulation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Relational.q21WaitingSupplier(spark, dir)
      .as[(Long, Long)].collect().toMap
    // the spec's shape, joined directly: a late line qualifies iff
    // ANOTHER supplier has a line on the order (EXISTS) and NO other
    // supplier has a LATE line on it (NOT EXISTS)
    val li = graft.sources.Tables.read(spark, dir, "lineitem")
      .join(graft.sources.Tables.read(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .as("late"))
      .as[(Long, Long, Boolean)].collect()
    val byOrder = li.groupBy(_._1)
    val expect = li.filter(_._3).filter { case (ok, sk, _) =>
      val others = byOrder(ok).filter(_._2 != sk)
      others.nonEmpty && !others.exists(_._3)
    }.map(r => (r._2, r._1)).distinct.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("ch1 cohort retention: day-0 row counts the whole cohort; later offsets never exceed it") {
    import spark.implicits._
    val rows = graft.queries.Relational
      .ch1CohortRetention(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val day0 = rs.find(_._2 == 0L)
      assert(day0.isDefined, s"cohort $c lacks its day-0 row")
      assert(rs.forall(_._3 <= day0.get._3), s"cohort $c: offset exceeds day-0")
    }
  }

  test("e5 matryoshka: prefix screen keeps the cascade contract of e4") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.read(spark, dir, "embeddings")
    val q = e.where(col("vec_id") === 17)
    val got = graft.similarity.Similarity
      .matryoshkaRerankTopK(e, q, prefixDim = 16, candidates = 100, topK = 10)
      .select("vec_id", "cos4", "rank").as[(Long, Double, Int)].collect()
    assert(got.length == 10 && !got.map(_._1).contains(17L))
    assert(got.sortBy(_._3).map(_._2).sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    // with candidates = full corpus the cascade degenerates to exact
    // brute force — same top-10 as s1's scorer on the same query
    val full = graft.similarity.Similarity
      .matryoshkaRerankTopK(e, q, prefixDim = 16, candidates = 500, topK = 10)
      .select("vec_id", "rank").as[(Long, Int)].collect().sortBy(_._2).map(_._1)
    val brute = graft.similarity.Similarity.bruteForceTopK(q, e, k = 10)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().sortBy(_._2).map(_._1)
    assert(full.sameElements(brute))
    intercept[IllegalArgumentException] {
      graft.similarity.Similarity.matryoshkaRerankTopK(e, q, candidates = 5, topK = 10)
    }
  }

  test("st2 multiset ops: multiplicities subtract and min, not collapse") {
    import spark.implicits._
    val rows = graft.queries.Relational
      .st2MultisetOps(spark, "/root/testdata/sf0.001")
      .as[(Long, String)].collect()
    val dir = "/root/testdata/sf0.001"
    def counts(year: Int) = graft.sources.Tables.read(spark, dir, "orders")
      .where(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .groupBy("o_custkey").count()
      .as[(Long, Long)].collect().toMap
    val c96 = counts(1996); val c97 = counts(1997)
    val expectBoth = c96.map { case (k, n) => k -> math.min(n, c97.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    val expectExcess = c96.map { case (k, n) => k -> (n - c97.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    val gotBoth = rows.filter(_._2 == "both_all").groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    val gotExcess = rows.filter(_._2 == "excess_1996").groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    assert(gotBoth == expectBoth && gotExcess == expectExcess)
    assert(gotExcess.values.exists(_ > 1L), "fixture must exercise multiplicity > 1")
  }

  test("rg1 trend slope: recovers a planted linear trend exactly; degenerate series yield null") {
    import spark.implicits._
    // value = 5 + 2·day over ten days → slope 2.0/day, mean 14.0
    val lin = (0 until 10).map(i => ("s1", day(i), i.toLong, Some(5.0 + 2.0 * i)))
    // a single point has zero time variance → null slope, not ±inf
    val single = Seq(("s2", day(0), 100L, Some(7.0)))
    val got = graft.queries.TimeSeriesQueries
      .trendSlope((lin ++ single).toDF("series_id", "ts", "event_id", "value"))
      .select("series_id", "n_values", "mean6", "slope_per_day6")
      .as[(String, Long, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("s1") == ((10L, 14.0, Some(2.0))))
    assert(got("s2") == ((1L, 7.0, None)))
  }

  test("cr2 correlation matrix: all unordered type pairs, coefficients in [-1, 1]") {
    import spark.implicits._
    val got = graft.queries.TimeSeriesQueries
      .cr2TypeCorrelation(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Option[Double])].collect()
    assert(got.length == 10) // C(5,2) event types
    assert(got.forall { case (a, b, n, c) =>
      a < b && n > 0 && c.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
    })
  }

  test("pf1 profile: one row per measure, counts consistent with the scan") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.Relational.pf1Profile(spark, dir)
      .as[(Long, String, Long, Long, Double, Double)].collect()
    val n = graft.sources.Tables.read(spark, dir, "lineitem").count()
    assert(rows.length == 4 && rows.forall(_._1 == n))
    assert(rows.forall { case (nr, _, np, nd, mn, mx) =>
      np <= nr && nd <= np && mn <= mx
    })
  }

  test("rs5 rolling autocorr: +1 on a ramp, -1 on an alternation, null on constants") {
    import spark.implicits._
    def series(id: String, vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, i) => (id, day(i), i.toLong, Some(v)) }
    val df = (series("ramp", (1 to 25).map(_.toDouble)) ++
      series("alt", (1 to 25).map(i => if (i % 2 == 0) 1.0 else -1.0)) ++
      series("flat", Seq.fill(25)(7.0)))
      .toDF("series_id", "ts", "event_id", "value")
    val got = graft.queries.TimeSeriesQueries.rollingCorr(df)
      .groupBy("series_id").agg(max("roll_autocorr6").as("mx"),
        min("roll_autocorr6").as("mn"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got("ramp") == ((Some(1.0), Some(1.0))))
    assert(got("alt") == ((Some(-1.0), Some(-1.0))))
    assert(got("flat") == ((None, None)), "zero variance → null, never ±inf")
  }

  test("IVFADC: a stored cell assignment reproduces the recomputed path exactly") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.read(spark, dir, "embeddings")
    val seeds = e.where(col("vec_id") < 16)
    val q = e.where(col("vec_id") === 17)
    val cents = e.where(col("vec_id") % 25 === 0)
    val stored = graft.similarity.Similarity.ivfCellAssignment(e, cents)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val s5a = graft.similarity.Similarity.ivfAdcTopK(e, seeds, q, cents, nProbe = 3)
    val s5b = graft.similarity.Similarity.ivfAdcTopK(e, seeds, q, cents, nProbe = 3,
      assignment = Some(stored))
    assert(rows(s5a) == rows(s5b))
    val s6a = graft.similarity.Similarity.ivfAdcResidualTopK(e, seeds, q, cents, nProbe = 3)
    val s6b = graft.similarity.Similarity.ivfAdcResidualTopK(e, seeds, q, cents, nProbe = 3,
      assignment = Some(stored))
    assert(rows(s6a) == rows(s6b))
  }

  test("blockedEditDistance: within-block pairs only, argmin ties to lowest id, zeros kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val recs = Seq(
      (1L, "red widget", "widget"), (2L, "red widget", "widget"), // dist 0
      (3L, "rad widget", "widget"),  // dist 1 to both 1 and 2
      (4L, "blue widget", "widget"), // dist >= 3 to all
      (5L, "red bolt", "bolt")       // different block: never paired
    ).toDF("id", "name", "block")
    val r = graft.dedup.Dedup.blockedEditDistance(recs, maxDist = 2)
      .orderBy("id")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(r == Seq(
      (1L, 2L, Some(0L), Some(2L)),  // best: exact dup 2 (0 beats 3's 1)
      (2L, 2L, Some(0L), Some(1L)),  // tie on dist 0 -> lowest id 1
      (3L, 2L, Some(1L), Some(1L)),
      (4L, 0L, None, None),
      (5L, 0L, None, None)))
  }

  test("blockedEditDistance: distinct-name form equals the naive record-grain semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 300 records over a small name universe with heavy duplication —
    // the regime the distinct-name rewrite exists for
    val adjs = Seq("red", "rad", "blue", "bold", "old")
    val nouns = Seq("widget", "widget2", "bolt")
    val recs = (0L until 300L).map { i =>
      val name = s"${adjs((i % 35 % adjs.size).toInt)} ${nouns((i % 3).toInt)}"
      (i, name, name.split(" ")(1))
    }.toDF("id", "name", "block")
    val fast = graft.dedup.Dedup.blockedEditDistance(recs, maxDist = 2)
      .orderBy("id").collect().toSeq.map(_.toString)
    // naive reference: block self-join on records, symmetric argmin
    val a = recs.select(col("block"), col("id").as("ia"), col("name").as("na"))
    val b = recs.select(col("block"), col("id").as("ib"), col("name").as("nb"))
    val prs = a.join(b, Seq("block")).where(col("ia") =!= col("ib"))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .where(col("dist") <= 2)
    val agg = prs.groupBy(col("ia").as("id")).agg(
      count(lit(1)).as("n_near"),
      min(struct(col("dist").as("d"), col("ib").as("m"))).as("best"))
    val naive = recs.select(col("id")).join(agg, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_near"), lit(0L)).as("n_near"),
        col("best.d").as("best_dist"), col("best.m").as("best_match"))
      .orderBy("id").collect().toSeq.map(_.toString)
    assert(fast == naive)
  }

  test("transitionMatrix: counts and row-normalized probabilities, event_id tie-break") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: A->B->A->B ; user 2: A->B (same-ts pair ordered by id)
    val ev = Seq(
      (1L, t(0), 1L, "A"), (1L, t(1), 2L, "B"), (1L, t(2), 3L, "A"), (1L, t(3), 4L, "B"),
      (2L, t(5), 10L, "A"), (2L, t(5), 11L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = graft.queries.TemporalQueries.transitionMatrix(ev)
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // A->B x3, B->A x1; P(B|A)=1.0, P(A|B)=1.0
    assert(r == Seq(("A", "B", 3L, 1.0), ("B", "A", 1L, 1.0)))
  }

  test("graft_morton: known interleaves; z-buckets bound both dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.MortonCode
    // bit-level truth: x=0b101, y=0b011 -> z = x bits at even, y at odd
    // = (1<<0)+(0<<2)+(1<<4) + (1<<1)+(1<<3)+(0<<5) = 1+16+2+8 = 27
    assert(MortonCode.interleave(5L, 3L) == 27L)
    assert(MortonCode.interleave(0L, 0L) == 0L)
    assert(MortonCode.interleave((1L << 31) - 1, 0L) == 0x1555555555555555L)
    graft.functions.GraftFunctions.register(spark)
    // locality: cells of a 64x64 grid bucketed by z >> 6 each span at
    // most an 8x8 tile in BOTH dimensions (z-curve tile property)
    val g = spark.range(64L * 64L).select(
      (col("id") / 64L).cast("long").as("x"), (col("id") % 64L).as("y"))
    val spans = g.select(col("x"), col("y"),
        call_function("graft_morton", col("x"), col("y")).as("z"))
      .groupBy((col("z") / 64L).cast("long").as("b"))
      .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")), count(lit(1)))
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.length == 64 && spans.forall(s => s._2 <= 7 && s._3 <= 7 && s._4 == 64))
  }

  test("pmi1: an always-adjacent pair outranks frequent-but-independent words") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("pmi1spec").toString
    import spark.implicits._
    // "new york" co-occurs exclusively; "the" is frequent everywhere
    val docs = (0L until 10L).map { i =>
      (i, s"the city of new york has the best bagels in the town$i")
    }.toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.TextAnalysis.pmi1Collocations(spark, dir, minCount = 5L)
      .as[(Long, String, String, Long, Double)].collect().toSeq
    val byPair = r.map(x => (x._2, x._3) -> x._5).toMap
    assert(byPair.contains(("new", "york")))
    // exclusive bigram: PMI = ln(N^2 * cb / (B * ca * cb_uni)) with
    // cb = ca = cuni = 10 -> highest possible association here
    val nyRank = r.find(x => x._2 == "new" && x._3 == "york").get._1
    val theRank = r.find(x => x._2 == "the").map(_._1)
    assert(theRank.forall(_ > nyRank), s"'new york' (rank $nyRank) not above 'the *'")
  }

  test("exp1: hand-computed Welch t; degenerate arms null out") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("exp1spec").toString
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // type x: A(users 0,2) = {1,3} mean 2 var 2; B(users 1,3) = {5,9}
    // mean 7 var 8 -> t = -5/sqrt(2/2 + 8/2) = -2.236068
    // type y: one row per arm -> null t
    val ev = Seq(
      (1L, ts, 0L, "x", 1.0, "{}"), (2L, ts, 2L, "x", 3.0, "{}"),
      (3L, ts, 1L, "x", 5.0, "{}"), (4L, ts, 3L, "x", 9.0, "{}"),
      (5L, ts, 0L, "y", 1.0, "{}"), (6L, ts, 1L, "y", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.TimeSeriesQueries.exp1AbTest(spark, dir)
      .orderBy("event_type")
      .as[(String, Long, Long, Double, Double, Option[Double])].collect().toSeq
    assert(r.map(_._1) == Seq("x", "y"))
    val x = r.head
    assert(x._2 == 2L && x._3 == 2L && x._4 == 2.0 && x._5 == 7.0)
    assert(math.abs(x._6.get - (-2.236068)) < 1e-6, s"t = ${x._6}")
    assert(r(1)._6.isEmpty)
  }

  test("t11 bigram NLL: word salad scores worse than natural repetition") {
    import org.apache.spark.sql.functions.col
    // corpus in a temp dir: doc 1 repeats one bigram (high P), doc 2
    // cycles rare transitions over the same unigrams
    val dir = java.nio.file.Files.createTempDirectory("t11spec").toString
    import spark.implicits._
    Seq(
      (1L, "a b a b a b a b", "en", "s", 15L),
      (2L, "b b a a b a a b", "en", "s", 15L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.TextAnalysis.t11BigramNll(spark, dir)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(r.map(_._2) == Seq(7L, 7L))
    assert(r(1)._3 > r(0)._3, s"salad ${r(1)._3} should exceed natural ${r(0)._3}")
  }

  test("seasonalDecompose: pure weekly signal scores 1, constant series scores null") {
    import spark.implicits._
    import java.sql.Timestamp
    // 4 weeks of daily points; series "w" is a pure dow function
    // (residual 0 -> strength 1), series "c" is constant (sst 0 ->
    // null strength), series "x" is dow + alternating-week noise
    def t(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    val rows = (0 until 28).flatMap { d =>
      val dow = java.time.LocalDate.of(2024, 1, d + 1).getDayOfWeek.getValue - 1
      Seq(("w", t(d), d.toLong, 10.0 + dow),
          ("c", t(d), 100L + d, 5.0),
          ("x", t(d), 200L + d, 10.0 + dow + (if ((d / 7) % 2 == 0) 1.0 else -1.0)))
    }.toDF("series_id", "ts", "event_id", "value")
    val r = graft.queries.TimeSeriesQueries.seasonalDecompose(rows)
      .orderBy("series_id", "dow")
      .as[(String, Long, Long, Double, Option[Double])].collect().toSeq
    val w = r.filter(_._1 == "w")
    assert(w.size == 7 && w.forall(_._3 == 4L) && w.forall(_._5.contains(1.0)))
    assert(w.map(x => x._2 -> x._4).toMap.forall { case (dow, s) => s == 10.0 + dow })
    assert(r.filter(_._1 == "c").forall(x => x._4 == 5.0 && x._5.isEmpty))
    val x = r.filter(_._1 == "x")
    // noise variance 1 vs dow variance 4 -> strength 4/5 exactly
    assert(x.forall(v => v._5.exists(s => math.abs(s - 0.8) < 1e-6)))
  }

  test("featureScale: hand-computed z and minmax; degenerate series null out") {
    import spark.implicits._
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      ("a", ts, 1L, 1.0), ("a", ts, 2L, 2.0), ("a", ts, 3L, 3.0),
      ("k", ts, 10L, 7.0), ("k", ts, 11L, 7.0), // constant: z,mm null
      ("s", ts, 20L, 9.0)                       // single point: z null
    ).toDF("series_id", "ts", "event_id", "value")
    val r = graft.queries.TimeSeriesQueries.featureScale(rows)
      .orderBy("series_id", "event_id")
      .as[(String, Long, Double, Option[Double], Option[Double])].collect().toSeq
    // series a: mean 2, std 1 -> z = -1, 0, 1; mm = 0, 0.5, 1
    assert(r.filter(_._1 == "a").map(x => (x._4.get, x._5.get)) ==
      Seq((-1.0, 0.0), (0.0, 0.5), (1.0, 1.0)))
    assert(r.filter(_._1 == "k").forall(x => x._4.isEmpty && x._5.isEmpty))
    assert(r.filter(_._1 == "s").forall(x => x._4.isEmpty && x._5.isEmpty))
  }

  test("funnelTiming: hand-computed medians/means; only later-stage reachers counted") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // u1: view@0 click@1 (3600s); u2: view@0 click@3 (10800s);
    // u3: view@0, never clicks -> excluded from the step
    val ev = Seq(
      (1L, t(0), 1L, "view"), (1L, t(1), 2L, "click"),
      (2L, t(0), 3L, "view"), (2L, t(3), 4L, "click"),
      (3L, t(0), 5L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = graft.queries.TemporalQueries.funnelTiming(ev, Seq("view", "click"))
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(r == Seq(("view->click", 2L, 7200.0, 7200.0)))
  }

  test("kaplanMeier: hand-computed curve with censoring; conversion-before-origin ignored") {
    import spark.implicits._
    import java.sql.Timestamp
    def d(n: Int, h: Int = 0) = Timestamp.valueOf(f"2024-01-${n + 1}%02d $h%02d:00:00")
    // A converts day 0; B converts day 2; C censored day 1;
    // D censored day 3; E purchases BEFORE its first view -> that
    // purchase must not count (censored at last event, day 1)
    val ev = Seq(
      (10L, d(0), "view"), (10L, d(0, 5), "purchase"),
      (11L, d(0), "view"), (11L, d(2), "purchase"),
      (12L, d(0), "view"), (12L, d(1), "click"),
      (13L, d(0), "view"), (13L, d(3), "click"),
      (14L, d(0, 2), "purchase"), (14L, d(0, 6), "view"), (14L, d(1, 6), "click")
    ).toDF("user_id", "ts", "event_type")
    val r = graft.queries.TemporalQueries.kaplanMeier(ev, "view", "purchase")
      .orderBy("day").as[(Long, Long, Long, Long, Double)].collect().toSeq
    // N=5. day0: risk 5, 1 death -> S=0.8; day1: risk 4, 2 censored
    // (C and E) -> S=0.8; day2: risk 2, 1 death -> S=0.4;
    // day3: risk 1, 1 censored -> S=0.4
    assert(r == Seq(
      (0L, 5L, 1L, 0L, 0.8), (1L, 4L, 0L, 2L, 0.8),
      (2L, 2L, 1L, 0L, 0.4), (3L, 1L, 0L, 1L, 0.4)))
  }

  test("sea2: deseasonalizing unmasks an anomaly the raw MAD fence cannot see") {
    import spark.implicits._
    import java.sql.Timestamp
    // 8 weeks daily: value = 10 + 20·dow (strong weekly swing 10..130)
    // + (week % 2) jitter, plus ONE +50 anomaly on a Tuesday. The raw
    // MAD fence reads the weekly swing as dispersion (MAD ~ tens) and
    // misses the spike; on residuals the spike is unmistakable.
    val rows = (0 until 56).map { d =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      val dow = date.getDayOfWeek.getValue - 1
      val anomaly = if (d == 22) 50.0 else 0.0 // 2024-01-23, a Tuesday
      ("s", Timestamp.valueOf(date.atTime(12, 0)), d.toLong,
        10.0 + 20.0 * dow + (d / 7 % 2).toDouble + anomaly)
    }.toDF("series_id", "ts", "event_id", "value")
    val Q = graft.queries.TimeSeriesQueries
    val raw = Q.madOutliers(rows).as[(String, Long, Double, Double, Long, Double)].head()
    val adj = Q.madOutliers(Q.deseasonalize(rows))
      .as[(String, Long, Double, Double, Long, Double)].head()
    assert(raw._5 == 0L, s"raw fence unexpectedly flagged ${raw._5}")
    assert(adj._5 >= 1L, "deseasonalized fence missed the planted anomaly")
    // the anomaly dominates the residual max-dev
    assert(adj._6 > 40.0)
  }

  test("scd2History: runs collapse, closed-open tiling, same-ts tie-break by event_id") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: A A B A (collapse the AA run); user 2: same-instant pair
    // ordered by event_id (B then A at minute 5)
    val ev = Seq(
      (1L, t(0), 10L, "A"), (1L, t(1), 11L, "A"),
      (1L, t(2), 12L, "B"), (1L, t(3), 13L, "A"),
      (2L, t(5), 20L, "B"), (2L, t(5), 21L, "A")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = graft.queries.TemporalQueries.scd2History(ev)
      .orderBy("user_id", "version")
      .as[(Long, Long, String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().toSeq
    assert(r.map(x => (x._1, x._2, x._3, x._6, x._7)) == Seq(
      (1L, 1L, "A", 2L, false), (1L, 2L, "B", 1L, false), (1L, 3L, "A", 1L, true),
      (2L, 1L, "B", 1L, false), (2L, 2L, "A", 1L, true)))
    // closed-open tiling: each valid_to equals the next valid_from
    r.groupBy(_._1).values.foreach { rows =>
      rows.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._5.contains(b._4))
        case _ =>
      }
    }
    // the same-instant pair tiles at zero duration, deterministically
    val u2 = r.filter(_._1 == 2L)
    assert(u2.head._5.contains(u2.head._4))
  }

  test("classifierAuc: perfect separation, all-ties, hand-computed mixed case, null exclusion") {
    import spark.implicits._
    def auc(rows: Seq[(Boolean, java.lang.Double)]): (Long, Long, Double) =
      graft.queries.PipelineQueries.classifierAuc(rows.toDF("pos", "score"))
        .as[(Long, Long, Double)].head()
    // every positive above every negative -> 1.0
    assert(auc(Seq((true, 3.0), (true, 2.0), (false, 1.0), (false, 0.0)))
      == ((2L, 2L, 1.0)))
    // reversed -> 0.0
    assert(auc(Seq((false, 3.0), (false, 2.0), (true, 1.0), (true, 0.0)))
      == ((2L, 2L, 0.0)))
    // one shared score -> 0.5 (average-rank tie handling)
    assert(auc(Seq((true, 1.0), (false, 1.0), (true, 1.0), (false, 1.0)))
      == ((2L, 2L, 0.5)))
    // hand-computed: pos {3, 1}, neg {2, 1}. Pairs: (3>2)=1, (3>1)=1,
    // (1>2)=0, (1=1)=0.5 -> 2.5/4 = 0.625
    assert(auc(Seq((true, 3.0), (true, 1.0), (false, 2.0), (false, 1.0)))
      == ((2L, 2L, 0.625)))
    // null scores excluded from both counts
    assert(auc(Seq((true, 3.0), (true, null), (false, 1.0), (false, null)))
      == ((1L, 1L, 1.0)))
  }
}
