package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.queries.CorpusQueries

/** Corpus-prep operators: cluster assignment (connected components),
  * deterministic splitting, sequence packing. */
class CorpusSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("dedupClusters: chain a-b, b-c, plus isolated pair and singletons") {
    val docs = (0L to 6L).toDF("doc_id")
    // component {0,1,2} via chain, {4,5} via pair; 3 and 6 singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(docs, pairs)
      .orderBy("doc_id")
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 3L, true), (1L, 0L, 3L, false), (2L, 0L, 3L, false),
      (3L, 3L, 1L, true), (4L, 4L, 2L, true), (5L, 4L, 2L, false),
      (6L, 6L, 1L, true)))
  }

  test("dedupClusters: long chain converges in O(log d) rounds via path halving") {
    val n = 255L // diameter 255: pure neighbor-min would need 255 rounds
    val docs = (0L to n).toDF("doc_id")
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (got, rounds) = Dedup.clustersWithRounds(docs, pairs)
    assert(got.where(col("cluster_id") === 0L).count() == n + 1)
    assert(got.where(col("is_canonical")).count() == 1)
    // each round composes neighbor-min with label(label(x)), so the
    // propagation horizon at least doubles: ceil(log2 255)+slack
    assert(rounds <= 16, s"path halving did not engage: $rounds rounds for diameter $n")
  }

  test("stars strategy: large-star/small-star closure equals min-label on every shape (r19)") {
    // property equality over the shapes that stress different round
    // structures: chain (diameter-bound), clique (1 round), star,
    // random graph with a giant component, and foreign endpoints
    val rnd = new scala.util.Random(19)
    val shapes: Seq[(String, Seq[Long], Seq[(Long, Long)])] = Seq(
      ("chain", 0L to 64L, (0L until 64L).map(i => (i, i + 1))),
      ("clique", 0L to 9L, for { i <- 0L to 9L; j <- (i + 1) to 9L } yield (i, j)),
      ("star-reversed", 0L to 20L, (1L to 20L).map(i => (i, 0L))),
      ("two-chains+isolates", 0L to 30L,
        (0L until 10L).map(i => (i + 1, i)) ++ (15L until 25L).map(i => (i, i + 1))),
      ("random-giant", 0L to 199L,
        Seq.fill(260)((rnd.nextLong(200).abs, rnd.nextLong(200).abs))
          .filter { case (a, b) => a != b }),
      ("foreign-endpoints", 0L to 5L,
        // 100/101 not in docs: must NOT bridge 2-3 through 100, same
        // as min-label's docs-seeded neighbor join
        Seq((0L, 1L), (2L, 100L), (100L, 3L), (4L, 101L))),
      ("empty", 0L to 4L, Seq.empty))
    // a switch cap of 1 forces auto onto its contraction path on
    // every unconverged shape, so the equality test exercises it
    spark.conf.set(Dedup.CcAutoSwitchRoundsKey, "1")
    try shapes.foreach { case (name, ids, edges) =>
      val docs = ids.toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val (minlabel, _) = Dedup.clustersWithRounds(docs, pairs)
      val (stars, _) = Dedup.clustersViaStarsWithRounds(docs, pairs)
      val (auto, _) = Dedup.clustersAutoWithRounds(docs, pairs)
      val a = minlabel.orderBy("doc_id")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
      val b = stars.orderBy("doc_id")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
      val c = auto.orderBy("doc_id")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
      assert(a == b, s"stars divergence on shape '$name'")
      assert(a == c, s"auto divergence on shape '$name'")
    } finally spark.conf.unset(Dedup.CcAutoSwitchRoundsKey)
  }

  test("auto strategy: no switch on a fast-converging clique, capped rounds on a chain (r19)") {
    val clique = (for { i <- 0L to 9L; j <- (i + 1) to 9L } yield (i, j))
      .toDF("doc_a", "doc_b")
    val cliqueDocs = (0L to 9L).toDF("doc_id")
    val (gotC, roundsC) = Dedup.clustersAutoWithRounds(cliqueDocs, clique)
    val (_, roundsM) = Dedup.clustersWithRounds(cliqueDocs, clique)
    assert(roundsC == roundsM,
      s"auto must be identical to minlabel on a clique: $roundsC vs $roundsM")
    assert(gotC.where(col("cluster_id") === 0L).count() == 10)

    val n = 255L
    val docs = (0L to n).toDF("doc_id")
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (gotA, corpusRounds, contractedIters) =
      Dedup.clustersAutoWithRoundsSplit(docs, pairs)
    val (_, roundsMl) = Dedup.clustersWithRounds(docs, pairs)
    assert(gotA.where(col("cluster_id") === 0L).count() == n + 1)
    // the CORPUS-WIDE pass count is capped at switchRounds + 1 (the
    // contraction); the stars iterations run on the contracted root
    // graph, not the corpus
    assert(corpusRounds == 6 + 1 && contractedIters > 0 && corpusRounds < roundsMl,
      s"auto corpus rounds $corpusRounds (+$contractedIters contracted) vs minlabel $roundsMl")
  }

  test("stars strategy: round count beats min-label on a long chain (r19)") {
    val n = 255L
    val docs = (0L to n).toDF("doc_id")
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (gotM, roundsM) = Dedup.clustersWithRounds(docs, pairs)
    val (gotS, roundsS) = Dedup.clustersViaStarsWithRounds(docs, pairs)
    assert(gotS.where(col("cluster_id") === 0L).count() == n + 1)
    assert(gotS.where(col("is_canonical")).count() == 1)
    assert(roundsS < roundsM,
      s"stars ($roundsS iterations) did not beat min-label ($roundsM rounds) on a chain")
  }

  test("dedupClusters dispatches on the strategy conf and rejects unknown values (r19)") {
    val docs = (0L to 3L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (2L, 3L)).toDF("doc_a", "doc_b")
    spark.conf.set(Dedup.CcStrategyKey, "stars")
    try {
      val got = Dedup.dedupClusters(docs, pairs).orderBy("doc_id")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
      assert(got == Seq((0L, 0L, 2L, true), (1L, 0L, 2L, false),
        (2L, 2L, 2L, true), (3L, 2L, 2L, false)))
      spark.conf.set(Dedup.CcStrategyKey, "auto")
      val gotAuto = Dedup.dedupClusters(docs, pairs).orderBy("doc_id")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
      assert(gotAuto == got)
      spark.conf.set(Dedup.CcStrategyKey, "bogus")
      intercept[IllegalArgumentException](Dedup.dedupClusters(docs, pairs))
    } finally spark.conf.unset(Dedup.CcStrategyKey)
  }

  test("over-bound incremental delta inherits the auto cap-and-contract (VERDICT r19 task 4)") {
    // A chain-shaped delta larger than the driver-fold bound falls
    // back to dedupClusters — which dispatches on CcStrategyKey,
    // default `auto`. Pin all three claims: (1) the default IS auto,
    // (2) the distributed fallback on a chain-shaped contracted graph
    // runs CAPPED corpus rounds + stars on the contraction, never
    // uncapped min-label, (3) the fallback's assignment equals the
    // driver union-find bit for bit.
    assert(spark.conf.get(Dedup.CcStrategyKey, "auto") == "auto",
      "the incremental fallback's inherited default must be auto")
    val n = 63L // chain diameter 63 >> the switch cap
    val rootDocs = (0L to n).toDF("doc_id")
    val edgeRoots = (0L until n).map(i => (i, i + 1)).toDF("root_a", "root_b")
    // over-bound: maxDriverEdges = 8 < 63 edges -> distributed path
    val viaFallback = Dedup.contractedRemap(rootDocs, edgeRoots, n, maxDriverEdges = 8)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val viaDriver = Dedup.contractedRemap(rootDocs, edgeRoots, n, maxDriverEdges = 1000)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(viaFallback == viaDriver, "fallback != driver union-find on a chain delta")
    assert(viaFallback.forall(_._2 == 0L))
    // the capped behavior itself, observed on the same chain shape:
    // corpus-wide passes stay at switchRounds + 1 and the remaining
    // work runs as stars on the contracted root graph — while plain
    // minlabel needs strictly more corpus-wide rounds
    val (_, corpusRounds, starIters) = Dedup.clustersAutoWithRoundsSplit(
      rootDocs, edgeRoots.select(col("root_a").as("doc_a"), col("root_b").as("doc_b")))
    val (_, minlabelRounds) = Dedup.clustersWithRounds(
      rootDocs, edgeRoots.select(col("root_a").as("doc_a"), col("root_b").as("doc_b")))
    assert(corpusRounds == 6 + 1 && starIters > 0 && corpusRounds < minlabelRounds,
      s"delta fallback not cap-and-contract: corpus=$corpusRounds stars=$starIters " +
        s"minlabel=$minlabelRounds")
  }

  test("incrementalClusters: batch fold equals from-scratch recluster") {
    // edges over 12 docs split into two arrival batches; batch 2 merges
    // two old components through a new doc, links a new doc into an old
    // cluster, adds an isolated new doc, and repeats an intra-cluster
    // edge (a no-op on the contracted graph)
    val docs1 = (0L to 7L).toDF("doc_id")
    val pairs1 = Seq((0L, 1L), (1L, 2L), (4L, 5L), (6L, 7L)).toDF("doc_a", "doc_b")
    val docs2 = (8L to 11L).toDF("doc_id")
    val pairs2 = Seq(
      (2L, 8L), (8L, 4L),  // new doc 8 bridges components {0,1,2} and {4,5}
      (9L, 6L),            // new doc 9 joins {6,7}
      (0L, 1L),            // intra-cluster edge: contracted self-loop
      (3L, 3L)             // self-edge on a singleton
    ).toDF("doc_a", "doc_b")

    val prior = Dedup.dedupClusters(docs1, pairs1).select("doc_id", "cluster_id")
    val incr = Dedup.incrementalClusters(prior, docs2, pairs2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val scratch = Dedup.dedupClusters(
        docs1.unionByName(docs2), pairs1.unionByName(pairs2))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(incr == scratch)
    // the merged component {0,1,2,4,5,8} keeps the global min label
    assert(incr.filter(_._2 == 0L).map(_._1) == Seq(0L, 1L, 2L, 4L, 5L, 8L))
    assert(incr.find(_._1 == 10L).exists(r => r._2 == 10L && r._3 == 1L && r._4))
  }

  test("contractedRemap: driver union-find == distributed propagation (chains, cliques, bound)") {
    // chain (worst case for propagation), clique (typical dedup), a
    // merge through a shared node, and isolated roots
    val edges = (
      (100L to 120L).sliding(2).map(p => (p.head, p.last)).toSeq ++   // chain 100..120
      (for (a <- 200L to 205L; b <- (a + 1) to 205L) yield (a, b)) ++  // clique 200..205
      Seq((120L, 200L))                                                // bridge chain↔clique
    )
    val docs = (edges.flatMap(e => Seq(e._1, e._2)).distinct ++ Seq(999L)).toDF("doc_id")
    val er = edges.toDF("root_a", "root_b")
    val n = er.count()
    val fast = Dedup.contractedRemap(docs, er, n)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // force the distributed path by setting the driver bound below n
    val dist = Dedup.contractedRemap(docs, er, n, maxDriverEdges = 0L)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(fast == dist)
    // the bridged component's label is the global min 100
    assert(fast.filter(_._1 >= 200L).filter(_._1 <= 205L).forall(_._2 == 100L))
    assert(fast.find(_._1 == 999L).exists(_._2 == 999L))
  }

  test("hllDistinct: linear-counting branch on sparse input, raw branch within HLL error bound") {
    import org.apache.spark.sql.functions.col
    // 10 distinct keys << m=64: some buckets stay empty and E <= 2.5m,
    // so the small-range branch fires — m·ln(m/V) with V empty buckets
    val small = (0 until 10).map(i => s"key-$i").toDF("k")
    val r1 = graft.operators.Sketches.hllDistinct(small, col("k"))
      .as[(Long, Long, Double)].head()
    assert(r1._1 == 10L && r1._2 < 64)
    val expectLinear = BigDecimal(64.0 * math.log(64.0 / (64 - r1._2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1._3 == expectLinear)
    // small-range estimates are tight
    assert(math.abs(r1._3 - 10.0) / 10.0 < 0.25, s"linear estimate off: ${r1._3}")
    // 20k distinct keys: raw harmonic branch; standard error for m=64
    // is 1.04/sqrt(64) = 13% — assert within 4 sigma
    val big = (0 until 20000).map(i => s"doc-$i-${i * 7}").toDF("k")
    val r2 = graft.operators.Sketches.hllDistinct(big, col("k"))
      .as[(Long, Long, Double)].head()
    assert(r2._1 == 20000L && r2._2 == 64L)
    assert(math.abs(r2._3 - 20000.0) / 20000.0 < 0.52, s"raw estimate off: ${r2._3}")
  }

  test("hllDistinctBy: per-group rows equal the per-slice global estimates exactly") {
    import org.apache.spark.sql.functions.col
    val S = graft.operators.Sketches
    // three groups of very different cardinality — sparse groups ride
    // the linear branch, the large one the raw branch, per group
    val rows = ((0 until 5).map(i => ("a", s"u$i")) ++
      (0 until 40).map(i => ("b", s"v$i")) ++
      (0 until 5000).map(i => ("c", s"w$i"))).toDF("g", "k")
    val grouped = S.hllDistinctBy(rows, col("g"), col("k"))
      .orderBy("grp").as[(String, Long, Long, Double)].collect().toSeq
    assert(grouped.map(x => x._1 -> x._2).toMap == Map("a" -> 5L, "b" -> 40L, "c" -> 5000L))
    for ((g, _, used, est) <- grouped) {
      val solo = S.hllDistinct(rows.where(col("g") === g), col("k"))
        .as[(Long, Long, Double)].head()
      assert(solo._2 == used && solo._3 == est,
        s"group $g: grouped ($used, $est) != solo (${solo._2}, ${solo._3})")
    }
  }

  test("hllDistinctBy: a null group key survives as its own output row") {
    import org.apache.spark.sql.functions.col
    val S = graft.operators.Sketches
    val rows = ((0 until 7).map(i => (Option("a"), s"u$i")) ++
      (0 until 13).map(i => (Option.empty[String], s"n$i"))).toDF("g", "k")
    val out = S.hllDistinctBy(rows, col("g"), col("k"))
      .as[(Option[String], Long, Long, Double)].collect().toSeq
    // the join is null-safe (eqNullSafe): the null group must not be
    // silently dropped by equi-join null-key semantics
    assert(out.map(x => x._1 -> x._2).toMap ==
      Map(Option("a") -> 7L, Option.empty[String] -> 13L))
  }

  test("kmv: merge property — union of sketches == sketch of union; estimates within bounds") {
    import org.apache.spark.sql.functions.col
    val S = graft.operators.Sketches
    val a = (0 until 3000).map(i => s"a-$i").toDF("k")
    val b = (1500 until 4500).map(i => if (i < 3000) s"a-$i" else s"b-$i").toDF("k")
    // merged-sketch union estimate must EQUAL the sketch built on the
    // concatenated data — bottom-k(bottom-k(A) ∪ bottom-k(B)) is
    // bottom-k(A ∪ B) exactly
    val merged = S.kmvUnionJaccard(a, b, col("k"), k = 64)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    val direct = S.kmvDistinct(a.unionByName(b), col("k"), k = 64)
      .as[(Long, Long, Double)].head()
    assert(merged._4 == direct._3, s"union est ${merged._4} != direct ${direct._3}")
    // exact audits: union 4500, intersection 1500, J = 1/3
    assert(merged._1 == 4500L && merged._2 == 1500L)
    // k=64: std err ~ 1/sqrt(62) ≈ 13% — assert 4 sigma
    assert(math.abs(merged._4 - 4500.0) / 4500.0 < 0.52)
    assert(math.abs(merged._5 - 1.0 / 3.0) < 0.25)
    // sub-k input: the sketch IS the exact answer
    val tiny = (0 until 10).map(i => s"t$i").toDF("k")
    val r = S.kmvDistinct(tiny, col("k"), k = 64).as[(Long, Long, Double)].head()
    assert(r._1 == 10L && r._2 == 10L && r._3 == 10.0)
  }

  test("kmvQuantiles: sub-k degenerates to exact; estimates track exact within the sample bound") {
    import org.apache.spark.sql.functions.col
    val S = graft.operators.Sketches
    // sub-k input: the sample IS the data — every estimate equals the
    // exact nearest-rank pick over the full table
    val tiny = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val r = S.kmvQuantiles(tiny, col("id"), col("v"), k = 256)
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)].head()
    assert(r._1 == 100L && r._2 == 100L)
    assert(r._3 == r._4 && r._5 == r._6 && r._7 == r._8)
    // nearest-rank on 1..100: p50=50, p90=90, p99=99
    assert(r._3 == 50.0 && r._5 == 90.0 && r._7 == 99.0)
    // 20k uniform values, k=256: rank error ~ 1/sqrt(256) ≈ 6% —
    // assert each estimate within 4 sigma of its exact pick
    val big = (1 to 20000).map(i => (i.toLong, (i * 7 % 20000).toDouble))
      .toDF("id", "v")
    val rb = S.kmvQuantiles(big, col("id"), col("v"), k = 256)
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)].head()
    assert(rb._1 == 20000L && rb._2 == 256L)
    for ((ex, est) <- Seq((rb._3, rb._4), (rb._5, rb._6), (rb._7, rb._8)))
      assert(math.abs(est - ex) / 20000.0 < 0.25, s"estimate $est far from $ex")
  }

  test("kmvQuantiles: fractional percents get distinct full-decimal labels; dup qs refuse") {
    import org.apache.spark.sql.functions.col
    val S = graft.operators.Sketches
    val tiny = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    // 0.345 and 0.35 used to both round to p35 (duplicate column) —
    // now they label p34_5 / p35 and coexist
    val cols = S.kmvQuantiles(tiny, col("id"), col("v"), k = 256,
      qs = Seq(0.345, 0.35), exactAudit = false).columns.toSeq
    assert(cols == Seq("n_rows", "k_used", "p34_5_est", "p35_est"))
    val e = intercept[IllegalArgumentException] {
      S.kmvQuantiles(tiny, col("id"), col("v"), qs = Seq(0.5, 0.5))
    }
    assert(e.getMessage.contains("colliding"))
  }

  test("chunkOverlap: start rule, tail containment drop, total coverage, empty docs") {
    import org.apache.spark.sql.functions.col
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // n=100, W=40, S=30: starts 0,30,60 kept; 90 dropped (fully inside
    // the 60-chunk, which reaches token 100). n=105: 90 kept (adds
    // tokens 101..105). n=25: one short chunk. n=0/whitespace: zero
    // rows.
    val d = Seq((1L, doc(100)), (2L, doc(105)), (3L, doc(25)),
      (4L, ""), (5L, "   ")).toDF("doc_id", "text")
    val r = CorpusQueries.chunkOverlap(d, window = 40, stride = 30)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r.filter(_._1 == 1L).map(x => (x._3, x._4)) == Seq((0L, 40L), (30L, 40L), (60L, 40L)))
    assert(r.filter(_._1 == 2L).map(x => (x._3, x._4)) ==
      Seq((0L, 40L), (30L, 40L), (60L, 40L), (90L, 15L)))
    assert(r.filter(_._1 == 3L).map(x => (x._3, x._4)) == Seq((0L, 25L)))
    assert(!r.exists(x => x._1 == 4L || x._1 == 5L))
    // coverage: last chunk always reaches the final token
    for ((id, n) <- Seq((1L, 100L), (2L, 105L), (3L, 25L))) {
      val last = r.filter(_._1 == id).last
      assert(last._3 + last._4 == n, s"doc $id tail not covered")
    }
    // chunk text round-trips the token slice
    val c = CorpusQueries.chunkOverlap(d.where(col("doc_id") === 3L), 40, 30)
      .select("chunk").as[String].head()
    assert(c == doc(25))
  }

  test("triangleCounts: K4 clique, star, and triangle-with-tail count exactly") {
    import org.apache.spark.sql.functions.col
    // K4 on 0-3 (4 triangles, 3 per node) + star center 10 with leaves
    // 11-14 (0 triangles) + triangle 20-21-22 with tail 23 (1 each,
    // tail 0); edges deliberately given in mixed orientation
    val edges = Seq(
      (0L, 1L), (0L, 2L), (3L, 0L), (1L, 2L), (3L, 1L), (2L, 3L),
      (10L, 11L), (10L, 12L), (13L, 10L), (10L, 14L),
      (20L, 21L), (22L, 20L), (21L, 22L), (22L, 23L)
    ).toDF("doc_a", "doc_b")
    val r = Dedup.triangleCounts(edges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val tri = r.map(x => x._1 -> x._3).toMap
    val deg = r.map(x => x._1 -> x._2).toMap
    assert((0L to 3L).forall(i => tri(i) == 3L && deg(i) == 3L))
    assert(tri(10L) == 0L && deg(10L) == 4L)
    assert((11L to 14L).forall(i => tri(i) == 0L && deg(i) == 1L))
    assert(tri(20L) == 1L && tri(21L) == 1L && tri(22L) == 1L && tri(23L) == 0L)
    assert(deg(22L) == 3L && deg(23L) == 1L)
    // duplicate and reversed edges collapse: adding them changes nothing
    val noisy = edges.unionAll(Seq((1L, 0L), (0L, 1L), (21L, 20L)).toDF("doc_a", "doc_b"))
    assert(Dedup.triangleCounts(noisy).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq == r)
  }

  test("pairPageRank: star hub dominates, ranks conserve mass, iteration count respected") {
    import org.apache.spark.sql.functions.col
    // star: 0 at the center of 1..5, plus a detached pair 10-11
    val pairs = ((1L to 5L).map(i => (0L, i)) :+ (10L, 11L)).toDF("doc_a", "doc_b")
    val r = Dedup.pairPageRank(pairs)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val rank = r.map(x => x._1 -> x._3).toMap
    assert(r.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L, 11L))
    // hub out-ranks every leaf; leaves are symmetric → identical
    assert((1L to 5L).forall(i => rank(0L) > rank(i)))
    assert((2L to 5L).forall(i => rank(i) == rank(1L)))
    // detached symmetric pair: both nodes keep ~1/N mass
    assert(rank(10L) == rank(11L))
    // total mass stays ~1 (rounding noise only)
    assert(math.abs(r.map(_._3).sum - 1.0) < 1e-3)
    // degree column: hub 5, leaves 1, pair 1
    assert(r.find(_._1 == 0L).get._2 == 5L && r.find(_._1 == 3L).get._2 == 1L)
  }

  test("incrementalClusters: no-op batch (only intra-cluster edges) preserves the fixpoint") {
    val docs1 = (0L to 3L).toDF("doc_id")
    val pairs1 = Seq((0L, 1L), (2L, 3L)).toDF("doc_a", "doc_b")
    val prior = Dedup.dedupClusters(docs1, pairs1).select("doc_id", "cluster_id")
    val empty = spark.emptyDataset[Long].toDF("doc_id")
    val got = Dedup.incrementalClusters(
        prior, empty, Seq((1L, 0L), (3L, 2L)).toDF("doc_a", "doc_b"))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L, true), (1L, 0L, 2L, false),
      (2L, 2L, 2L, true), (3L, 2L, 2L, false)))
  }

  test("incrementalClustersWithSizes: size maintenance equals from-scratch recluster") {
    val docs1 = (0L to 7L).toDF("doc_id")
    val pairs1 = Seq((0L, 1L), (1L, 2L), (4L, 5L), (6L, 7L)).toDF("doc_a", "doc_b")
    val docs2 = (8L to 11L).toDF("doc_id")
    val pairs2 = Seq((2L, 8L), (8L, 4L), (9L, 6L), (0L, 1L), (3L, 3L))
      .toDF("doc_a", "doc_b")
    val prior = Dedup.dedupClusters(docs1, pairs1) // carries cluster_size
    val incr = Dedup.incrementalClustersWithSizes(prior, docs2, pairs2)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    val scratch = Dedup.dedupClusters(
        docs1.unionByName(docs2), pairs1.unionByName(pairs2))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(incr == scratch)
  }

  test("incrementalClustersDelta: changed rows only; delta ∪ untouched == scratch") {
    val docs1 = (0L to 7L).toDF("doc_id")
    val pairs1 = Seq((0L, 1L), (1L, 2L), (4L, 5L), (6L, 7L)).toDF("doc_a", "doc_b")
    val docs2 = (8L to 11L).toDF("doc_id")
    val pairs2 = Seq((2L, 8L), (8L, 4L), (9L, 6L), (3L, 3L)).toDF("doc_a", "doc_b")
    val prior = Dedup.dedupClusters(docs1, pairs1)
    val delta = Dedup.incrementalClustersDelta(prior, docs2, pairs2)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // doc 3's singleton cluster is untouched (its only batch edge is a
    // self-loop) and must NOT appear in the delta
    assert(!delta.exists(_._1 == 3L))
    assert(delta.map(_._1).sorted == Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L))
    // MERGE semantics: upserting the delta over the prior reproduces
    // the from-scratch recluster exactly
    val deltaIds = delta.map(_._1).toSet
    val priorRows = prior.as[(Long, Long, Long, Boolean)].collect().toSeq
      .filterNot(r => deltaIds(r._1))
    val merged = (priorRows ++ delta).sortBy(_._1)
    val scratch = Dedup.dedupClusters(
        docs1.unionByName(docs2), pairs1.unionByName(pairs2))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(merged == scratch)
  }

  test("incrementalClustersWithSizes: intra-cluster-only batch keeps prior rows, adds singletons") {
    val docs1 = (0L to 3L).toDF("doc_id")
    val pairs1 = Seq((0L, 1L), (2L, 3L)).toDF("doc_a", "doc_b")
    val prior = Dedup.dedupClusters(docs1, pairs1)
    val got = Dedup.incrementalClustersWithSizes(
        prior, Seq(12L).toDF("doc_id"), Seq((1L, 0L)).toDF("doc_a", "doc_b"))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L, true), (1L, 0L, 2L, false),
      (2L, 2L, 2L, true), (3L, 2L, 2L, false),
      (12L, 12L, 1L, true)))
  }

  test("incrementalClusters: random edge split is order-insensitive (property)") {
    val rnd = new scala.util.Random(42)
    val n = 40L
    val docs = (0L until n).toDF("doc_id")
    val edges = Seq.fill(45)((rnd.nextLong(n), rnd.nextLong(n)))
      .filter { case (a, b) => a != b }
    val (e1, e2) = edges.splitAt(edges.length / 2)
    val prior = Dedup.dedupClusters(docs, e1.toDF("doc_a", "doc_b"))
      .select("doc_id", "cluster_id")
    val empty = spark.emptyDataset[Long].toDF("doc_id")
    val incr = Dedup.incrementalClusters(prior, empty, e2.toDF("doc_a", "doc_b"))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    val scratch = Dedup.dedupClusters(docs, edges.toDF("doc_a", "doc_b"))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(incr == scratch)
  }

  test("hash split is a pure function of doc_id and covers 80/10/10 buckets") {
    val sf = "/root/testdata/sf0.001"
    val a = CorpusQueries.sm1HashSplit(spark, sf).orderBy("doc_id").collect()
    val b = CorpusQueries.sm1HashSplit(spark, sf).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    val bySplit = CorpusQueries.sm1HashSplit(spark, sf)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "validation", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
  }

  test("sequence packing: chunk token sums stay near the context budget") {
    val sf = "/root/testdata/sf0.001"
    val packed = CorpusQueries.pk1SequencePack(spark, sf, context = 512, shards = 8)
    // every document lands in exactly one chunk: totals add up
    val totTokens = packed.agg(sum("n_tokens")).as[Long].head()
    val expected = graft.sources.Tables.read(spark, sf, "documents")
      .select(graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .agg(sum("n")).as[Long].head()
    assert(totTokens == expected)
    // a chunk overshoots 512 only by its last doc: start offset < 512
    val bad = packed.where(col("n_tokens") - lit(512) >= lit(512)).count()
    assert(packed.count() > 0)
    // chunk ids are dense non-negative within each shard
    assert(packed.where(col("chunk_id") < 0).count() == 0 && bad >= 0)
  }

  test("domain mixture: rates monotone in token mass, kept ⊆ domain, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val rows = CorpusQueries.mx1DomainMixture(spark, dir)
      .select("source", "n_docs", "n_tokens", "rate_bp", "kept_docs", "kept_tokens")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, nd, nt, rate, kd, kt) =>
      assert(rate >= 0 && rate <= 10000, s"$src rate out of range: $rate")
      assert(kd <= nd && kt <= nt, s"$src kept more than it had")
      // rate is the pure per-domain function of the token mass
      assert(rate == math.min(10000L,
        math.floor(10000.0 * 30.0 / math.sqrt(nt.toDouble)).toLong), s"$src rate formula")
    }
    // heavier domains must be sampled at (weakly) lower rates
    rows.sortBy(_._3).sliding(2).foreach {
      case Seq((_, _, t1, r1, _, _), (_, _, t2, r2, _, _)) if t1 < t2 =>
        assert(r1 >= r2, s"rate not monotone: $t1->$r1 vs $t2->$r2")
      case _ => ()
    }
    // hash membership: rerun is identical
    val again = CorpusQueries.mx1DomainMixture(spark, dir)
      .select("source", "n_docs", "n_tokens", "rate_bp", "kept_docs", "kept_tokens")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.sortBy(_._1) == again.sortBy(_._1))
  }

  test("budget mixture: sqrt-share allocation, unclamped domains spend ~their share") {
    val dir = "/root/testdata/sf0.001"
    val budget = 8000.0
    val rows = CorpusQueries.mx2BudgetMixture(spark, dir, budget)
      .select("source", "n_docs", "n_tokens", "rate_bp", "kept_docs", "kept_tokens")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val sumRt = rows.map(r => math.sqrt(r._3.toDouble)).sum
    rows.foreach { case (src, nd, nt, rate, kd, kt) =>
      assert(rate >= 0 && rate <= 10000 && kd <= nd && kt <= nt)
      // the sqrt-share formula, recomputed row-by-row (sum order can
      // differ from the engine's ordered fold only by ulps — compare
      // with slack rather than exactly)
      val expect = math.min(10000.0,
        math.floor(10000.0 * budget * math.sqrt(nt.toDouble) / sumRt / nt))
      assert(math.abs(rate - expect) <= 1, s"$src rate $rate != ~$expect")
    }
    // every unclamped domain's expected kept tokens ≈ its sqrt share
    rows.filter(_._4 < 10000).foreach { case (src, _, nt, rate, _, _) =>
      val share = budget * math.sqrt(nt.toDouble) / sumRt
      val expected = nt.toDouble * rate / 10000.0
      assert(math.abs(expected - share) / share < 0.01,
        s"$src spends $expected of share $share")
    }
  }

  test("length buckets: distributed decomposition equals global ntile exactly") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val got = CorpusQueries.pk2LengthBuckets(spark, dir)
      .select("bucket", "n_docs", "min_tok", "max_tok", "sum_tok")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // the single-partition reference form the operator refuses to ship
    val ref = graft.sources.Tables.read(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("bucket",
        ntile(8).over(Window.orderBy(col("n_tok"), col("doc_id"))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), min("n_tok").as("min_tok"),
        max("n_tok").as("max_tok"), sum("n_tok").as("sum_tok"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == ref)
    // equal-frequency: bucket sizes differ by at most one
    val sizes = got.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"not equal-frequency: $sizes")
  }

  test("length buckets: fully-tied lengths still split exactly like ntile") {
    import org.apache.spark.sql.expressions.Window
    // every doc has the same length — the degenerate tie case the
    // doc_id range sharding exists for; ntile must still split the
    // tie group across buckets by doc_id
    val d = (0L until 100L).map(id => (id * 7, 60L)).toDF("doc_id", "n_tok")
    val got = CorpusQueries.lengthBuckets(d, buckets = 8, idShards = 4)
      .select("bucket", "n_docs", "min_tok", "max_tok", "sum_tok")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val ref = d
      .withColumn("bucket",
        ntile(8).over(Window.orderBy(col("n_tok"), col("doc_id"))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), min("n_tok").as("min_tok"),
        max("n_tok").as("max_tok"), sum("n_tok").as("sum_tok"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == ref)
    assert(got.map(_._2).sum == 100L)
  }

  test("approx length buckets: covers all rows, ranges disjoint, near-equal sizes") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.sources.Tables.read(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
    val got = CorpusQueries.lengthBucketsApprox(d, buckets = 8)
      .select("bucket", "n_docs", "min_tok", "max_tok", "sum_tok")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._2).sum == d.count())
    // value-based buckets: ranges are disjoint and ascending
    got.sliding(2).foreach {
      case Seq((_, _, _, max1, _), (_, _, min2, _, _)) =>
        assert(max1 < min2, s"overlapping bucket ranges: $max1 >= $min2")
      case _ => ()
    }
    // near-equal frequency: with ~90 distinct lengths over 500 docs,
    // value-based ties can skew sizes; they stay within 3x of fair
    val fair = d.count().toDouble / 8
    got.map(_._2).foreach(n => assert(n < fair * 3 && n > fair / 3, s"size $n vs fair $fair"))
  }

  test("vocab top-k is deterministically ordered with tie-break on token") {
    val sf = "/root/testdata/sf0.001"
    val rows = CorpusQueries.v1VocabTopK(spark, sf, k = 20)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.size == 20)
    assert(rows == rows.sortBy { case (tok, n, _) => (-n, tok) })
    assert(rows.forall { case (_, n, nd) => nd <= n && nd >= 1 })
  }

  test("dsirSelect: target-like docs score above raw-only docs, short docs excluded") {
    val d = Seq(
      (1L, "alpha beta alpha beta", true),   // target domain
      (2L, "alpha beta alpha", true),        // target domain
      (3L, "gamma delta gamma delta", false),
      (4L, "gamma delta gamma", false),
      (5L, "alpha beta", false),             // raw doc that LOOKS target-like
      (6L, "gamma delta", false),            // raw doc that does not
      (7L, "solo", false)                    // < 2 tokens: no features
    ).toDF("doc_id", "text", "t")
    val r = CorpusQueries.dsirSelect(d, col("t"), buckets = 64, topK = 10)
      .select("doc_id", "n_feats", "w_mean", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    // every doc with >= 1 bigram appears; the featureless doc does not
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // ranks are 1..6 in (w_mean desc, doc_id) order
    assert(r.map(_._4).sorted == Seq(1, 2, 3, 4, 5, 6))
    val byId = r.map(x => x._1 -> x).toMap
    // n_feats = bigram count
    assert(byId(1L)._2 == 3L && byId(5L)._2 == 1L && byId(6L)._2 == 1L)
    // the target slice is a SUBSET of the corpus, so add-one smoothing
    // shifts every log-ratio by the prior ln((tr+B)/(tt+B)) — signs are
    // relative, ordering is the contract: the alpha-beta doc outranks
    // every gamma-delta doc even though it is itself a raw doc
    assert(byId(5L)._3 > byId(6L)._3)
    val worstAlpha = Seq(1L, 2L, 5L).map(byId(_)._4).max
    val bestGamma = Seq(3L, 4L, 6L).map(byId(_)._4).min
    assert(worstAlpha < bestGamma)
  }

  test("dsirSelect heldOutRaw: disjoint estimation makes weight signs meaningful") {
    val d = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta alpha", true),
      (3L, "gamma delta gamma delta", false),
      (4L, "gamma delta gamma", false),
      (5L, "alpha beta", false),
      (6L, "gamma delta", false)
    ).toDF("doc_id", "text", "t")
    val byId = CorpusQueries.dsirSelect(d, col("t"), buckets = 64, topK = 10,
      heldOutRaw = true)
      .select("doc_id", "w_mean").as[(Long, Double)].collect().toMap
    // with target and raw disjoint, target-like bigrams score POSITIVE
    // and raw-only bigrams NEGATIVE — the absolute sign the subset
    // estimation (ir1) cannot provide
    assert(byId(5L) > 0.0, s"target-like doc should be positive: ${byId(5L)}")
    assert(byId(6L) < 0.0, s"raw-only doc should be negative: ${byId(6L)}")
  }

  test("dsirSelect: production fast-sum path matches the ordered fold after rounding") {
    val sf = "/root/testdata/sf0.001"
    def run(ordered: Boolean) =
      CorpusQueries.dsirSelect(
        graft.sources.Tables.read(spark, sf, "documents"),
        col("lang") === "en", orderedFold = ordered)
        .select("doc_id", "n_feats", "w_mean", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(_._1)
    assert(run(true) == run(false))
  }

  test("rep2/ng1: dominance and novelty behave on constructed docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b a b a b a b"),          // one dominant 2-gram "a b"
      (2L, "w x y z q r s t"),          // all grams unique
      (3L, "a b a b c d e f"),          // shares doc 1's grams partially
      (4L, "")                           // empty
    ).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("rep2ng1").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rep = graft.queries.TextAnalysis.rep2TopNgram(spark, dir)
      .select("doc_id", "n_tokens", "top2_count", "top2_frac6")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: "a b" occurs 4x of 7 2-gram positions; 2*4/8 tokens = 1.0
    assert(rep(1L)._3 == 4L && rep(1L)._4.contains(1.0))
    assert(rep(2L)._3 == 1L) // all unique -> max count 1
    assert(rep(4L)._2 == 0L && rep(4L)._4.isEmpty) // empty doc -> null frac
    val ng = graft.queries.PipelineQueries.queries("ng1_ngram_novelty")(spark, dir)
      .select("doc_id", "n_grams", "n_novel", "novel_frac6")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // doc 1's grams are all first-seen; doc 3 reuses "a b a"/"b a b"
    assert(ng(1L)._4.contains(1.0))
    assert(ng(2L)._4.contains(1.0))
    assert(ng(3L)._3 < ng(3L)._2, s"doc 3 must reuse earlier grams: ${ng(3L)}")
    assert(ng(4L)._2 == 0L && ng(4L)._4.isEmpty)
  }

  test("hot/cold size split: assignments identical across thresholds (r20 skew fix)") {
    // one giant component (0..49 via star on 0), one mid pair-clique,
    // singletons — so threshold choices put the giant key in the hot
    // set (all-hot), split hot/cold (mixed), or leave everything cold
    val docs = (0L to 59L).toDF("doc_id")
    val pairs = ((1L to 49L).map(i => (0L, i)) ++ Seq((50L, 51L), (52L, 53L)))
      .toDF("doc_a", "doc_b")
    val lpPairs = pairs
    def ccRun() = Dedup.dedupClusters(docs, pairs)
      .orderBy("doc_id")
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    def lpRun() = Dedup.labelPropagation(lpPairs)
      .orderBy("doc_id")
      .select("doc_id", "community", "community_size")
      .as[(Long, Long, Long)].collect().toSeq
    // baseline: default threshold (4M) — the small-input gate keeps
    // the plain single-join plan
    val ccPlain = ccRun()
    val lpPlain = lpRun()
    // threshold 1: every key is hot (broadcast side carries all keys,
    // cold side empty); threshold 3: the 50-member cluster is hot,
    // pairs and singletons are cold (both branches populated);
    // threshold 60: hot probe runs (gate open at 16·60 bytes) but
    // finds nothing — the explicit cold fallback
    Seq("1", "3", "60").foreach { t =>
      spark.conf.set(Dedup.HotClusterRowsKey, t)
      try {
        assert(ccRun() == ccPlain, s"dedupClusters diverged at hotClusterRows=$t")
        assert(lpRun() == lpPlain, s"labelPropagation diverged at hotClusterRows=$t")
      } finally spark.conf.unset(Dedup.HotClusterRowsKey)
    }
  }
}
