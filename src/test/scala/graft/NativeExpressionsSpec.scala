package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.{GraftFunctions, TextFunctions}

/** The native one-pass kernels (graft_shingle_hashes, graft_minhash,
  * graft_simhash) must be EXACTLY equal to the composed-Column
  * pipelines they replace — those pipelines are the DuckDB oracle
  * twins, so any divergence breaks the correctness gate silently.
  * Adversarial inputs: tabs/newlines (Spark `trim` strips 0x20 only,
  * so a leading tab yields a leading empty token in BOTH paths),
  * blank/short texts, unicode, repeated tokens.
  */
class NativeExpressionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",                       // exactly n tokens for n=3
    "a b",                         // fewer than n tokens
    "solo",
    "",                            // blank -> empty hashes
    "   ",                         // spaces only
    "\tleading tab here and more", // trim keeps \t -> leading empty token
    "line\nbreak inside the text body",
    "döc ümläut çharacters in wörds here",
    "rep rep rep rep rep rep",     // heavy duplication
    "  padded   with   runs   of spaces  ",
    (1 to 60).map(i => s"tok$i").mkString(" "))

  private def df = {
    GraftFunctions.register(spark)
    texts.zipWithIndex
      .toDF("text", "doc_id")
  }

  test("graft_shingle_hashes(text, 3) == shingleHashes(wordShingles(text, 3))") {
    val cmp = df.select(
      call_function("graft_shingle_hashes", col("text"), lit(3)).as("native"),
      Dedup.shingleHashes(Dedup.wordShingles(col("text"), 3)).as("composed"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("graft_shingle_hashes(text, 1) == per-token hashes (simhash input)") {
    val cmp = df.select(
      call_function("graft_shingle_hashes", col("text"), lit(1)).as("native"),
      Dedup.tokenHashes(col("text")).as("composed"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("graft_minhash == minhashSignature over the same digests") {
    val digs = df
      .select(call_function("graft_shingle_hashes", col("text"), lit(3)).as("digs"))
      .where(size(col("digs")) > 0)
      .localCheckpoint(true) // barrier: same precondition as production use
    val cmp = digs.select(
      call_function("graft_minhash", col("digs"), lit(12)).as("native"),
      Dedup.minhashSignature(col("digs"), 12).as("composed"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("native simhash path == portable simhash32 column") {
    val cmp = df.select(
      call_function("graft_simhash",
        call_function("graft_shingle_hashes", col("text"), lit(1))).as("native"),
      Dedup.simhash32(col("text")).as("composed"))
    cmp.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), r.toString)
    }
  }

  test("graft_simhash64 == portable 32-bit folds over lo/hi token hashes") {
    // hi token hash: md5 hex chars 9-16 (digest bytes 4-7 big-endian)
    val hiHashes = transform(TextFunctions.wsTokens(col("text")),
      t => conv(substring(md5(t), 9, 8), 16, 10).cast("long"))
    val cmp = df.select(
      call_function("graft_simhash64", col("text")).as("native"),
      Dedup.simhashFromHashes(Dedup.tokenHashes(col("text"))).as("lo"),
      Dedup.simhashFromHashes(hiHashes).as("hi"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[Long](0) == Seq(r.getLong(1), r.getLong(2)), r.toString)
    }
  }

  test("graft_norm_fp == composed normalizedFingerprint (incl. regex quirks)") {
    val adversarial = texts ++ Seq(
      "\tTabs\tAND\tCaps!", "Ünïcode ÅBC déjà-vu", "a.b,c;d:e", "...",
      "MiXeD   CaSe\n\nwithvertical\ftabs", "1234 !@#$ 5678")
    val cmp = adversarial.zipWithIndex.toDF("text", "i").select(
      call_function("graft_norm_fp", col("text")).as("native"),
      TextFunctions.normalizedFingerprint(col("text")).as("composed"))
    cmp.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1), r.toString)
    }
  }

  test("kernel matches wsTokens token-count semantics on whitespace edge cases") {
    val cmp = df.select(
      size(call_function("graft_shingle_hashes", col("text"), lit(1))).as("native_n"),
      size(TextFunctions.wsTokens(col("text"))).as("tok_n"))
    cmp.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1), r.toString)
    }
  }

  test("graft_sign_bands == composed per-bit graft_dot bands (bit-identical keys)") {
    import graft.similarity.Similarity
    val rnd = new scala.util.Random(11)
    val dim = 16
    // include sign-boundary-adjacent vectors: tiny components push
    // projections near 0 where any reassociation would flip bits
    val vecs = (0L until 64L).map { id =>
      (id, Array.fill(dim)((rnd.nextDouble() - 0.5) *
        (if (id % 7 == 0) 1e-9 else 2.0)))
    }.toDF("id", "emb")
    val native = Similarity.signBands(vecs, bits = 11, bands = 5, dim = dim)
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    val composed = Similarity.signBandsComposed(vecs, bits = 11, bands = 5, dim = dim)
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(native == composed)
  }

  test("graft_sign_bands_adaptive: base keys match, probes are the most-marginal flips") {
    import graft.similarity.Similarity
    val rnd = new scala.util.Random(23)
    val dim = 16
    val bits = 7
    val bands = 3
    val probes = 2
    val vecs = (0L until 48L).map { id =>
      (id, Array.fill(dim)((rnd.nextDouble() - 0.5) * 2.0))
    }
    val df = vecs.toDF("id", "emb")
    val got = df.select(col("id"),
        call_function("graft_sign_bands_adaptive",
          col("emb"), lit(bits), lit(bands), lit(dim), lit(probes)).as("keys"))
      .orderBy("id").as[(Long, Seq[Long])].collect().toMap
    val base = Similarity.signBands(
        df.select(col("id"), col("emb")), bits, bands, dim)
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toMap
    val stride = 1 + probes
    vecs.foreach { case (id, emb) =>
      val keys = got(id)
      assert(keys.size == bands * stride)
      // Scala-side recompute of each band's margins from the pinned planes
      (0 until bands).foreach { j =>
        assert(keys(j * stride) == base(id)(j), s"base key mismatch id=$id band=$j")
        val margins = (0 until bits).map { i =>
          val plane = Similarity.lshPlane(j * bits + i, dim)
          val s = (0 until dim).foldLeft(0.0)((acc, d) => acc + emb(d) * plane(d))
          (math.abs(s), i)
        }.sorted
        (0 until probes).foreach { t =>
          val expect = base(id)(j) ^ (1L << margins(t)._2)
          assert(keys(j * stride + 1 + t) == expect,
            s"probe $t mismatch id=$id band=$j")
        }
      }
    }
  }

  test("graft_sign_bands fails loudly on wrong-length embeddings") {
    val bad = Seq((0L, Array(1.0, 2.0))).toDF("id", "emb")
    val e = intercept[Exception] {
      graft.similarity.Similarity.signBands(bad, bits = 4, bands = 2, dim = 64).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("embedding length")))
  }
}
