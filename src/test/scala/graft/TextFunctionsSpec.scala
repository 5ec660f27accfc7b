package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect()(0).getAs[T]("r")

  test("token counts") {
    assert(one[Int](tokenCount(col("text")), "the quick  brown fox") == 4)
    assert(one[Int](tokenCount(col("text")), "   ") == 0)
    assert(one[Int](tokenCount(col("text")), "") == 0)
    // BPE-ish: "don't stop 42!" → don + ' + t + stop + 4 + 2 + !
    assert(one[Int](bpeTokenCount(col("text")), "don't stop 42!") == 7)
  }

  test("punctuation ratio counts marks over non-space chars") {
    // "a,b." → 2 punct / 4 non-space
    assert(one[Double](punctRatio(col("text")), "a,b.") == 0.5)
    assert(one[Double](punctRatio(col("text")), " ") == 0.0)
  }

  test("stopword ratio and mean token length") {
    assert(one[Double](stopwordRatio(col("text")), "The cat sat") == 1.0 / 3)
    assert(one[Double](meanTokenLen(col("text")), "ab cdef") == 3.0)
  }

  test("language heuristic picks marker-richest language, und on silence") {
    assert(one[String](langGuess(col("text")), "der hund und die katze") == "de")
    assert(one[String](langGuess(col("text")), "the cat of the house") == "en")
    assert(one[String](langGuess(col("text")), "zzz qqq") == "und")
    // tie between en and fr markers → code order: en
    assert(one[String](langGuess(col("text")), "the le") == "en")
  }

  test("normalized fingerprint collapses formatting-only variation") {
    val a = one[String](normalizedFingerprint(col("text")), "Hello,  World!")
    val b = one[String](normalizedFingerprint(col("text")), "hello world")
    assert(a == b)
  }

  test("rolling min-hash: equal on shared content, null when shorter than k") {
    val a = one[String](rollingMinHash(col("text")), "abcdefghij")
    val b = one[String](rollingMinHash(col("text")), "abcdefghij")
    assert(a == b && a != null)
    assert(one[String](rollingMinHash(col("text")), "short") == null)
  }

  test("quality score is bounded and rewards clean prose") {
    val clean = "the quick brown fox jumps over the lazy dog and runs into the woods"
    val junk = "!!! ### $$$ %%%"
    val qc = one[Double](qualityScore(col("text")), clean)
    val qj = one[Double](qualityScore(col("text")), junk)
    assert(qc > qj && qc <= 1.0 && qj >= 0.0)
  }

  test("pii scrub: emails, IPs, and phone runs redact with typed placeholders") {
    val dirty = "mail bob.smith+x@corp.example.org or call +1 415-555-0199, " +
      "host 192.168.0.12 is fine, plain words stay"
    assert(one[Int](piiCount(col("text"), EmailRe), dirty) == 1)
    assert(one[Int](piiCount(col("text"), Ipv4Re), dirty) == 1)
    assert(one[Int](piiCount(col("text"), PhoneRe), dirty) == 1)
    val scrubbed = one[String](piiScrub(col("text")), dirty)
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<IP>") &&
      scrubbed.contains("<PHONE>"))
    assert(!scrubbed.contains("@") && !scrubbed.contains("192.168"))
    // clean text passes through untouched
    val clean = "no private data in this sentence at all"
    assert(one[String](piiScrub(col("text")), clean) == clean)
    // SSN-shaped ids: the tighter pattern wins over the phone pattern
    // (scrub order), even though both count it on raw text
    val ssn = "id 123-45-6789 on file"
    assert(one[Int](piiCount(col("text"), SsnRe), ssn) == 1)
    assert(one[Int](piiCount(col("text"), PhoneRe), ssn) == 1)
    val sScrub = one[String](piiScrub(col("text")), ssn)
    assert(sScrub == "id <SSN> on file", sScrub)
    // street addresses: number + capitalized name(s) + suffix, with
    // and without the abbreviation period; lowercase words don't match
    val addr = "ship to 1234 Elm Street or 99 Mountain View Rd. today"
    assert(one[Int](piiCount(col("text"), AddressRe), addr) == 2)
    val aScrub = one[String](piiScrub(col("text")), addr)
    assert(aScrub == "ship to <ADDR> or <ADDR> today", aScrub)
    assert(one[Int](piiCount(col("text"), AddressRe), "10 downtown st corner") == 0)
    // suffix needs a word boundary: "St" inside "Store" must not match
    assert(one[Int](piiCount(col("text"), AddressRe), "meet at 12 Main Store today") == 0)
    assert(one[String](piiScrub(col("text")), "meet at 12 Main Store today")
      == "meet at 12 Main Store today")
    // a phone preceding an address: address scrubs first, so the
    // phone pattern cannot absorb the street number
    val both = "call 206-555-0142 99 Mountain View Rd"
    assert(one[String](piiScrub(col("text")), both) == "call <PHONE> <ADDR>")
  }

  test("gopher rules: keep decision matches a row-by-row recompute; both outcomes occur") {
    val rows = graft.queries.TextAnalysis.t7GopherRules(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_words", "mean_word_len6", "alpha_ratio6",
        "symbol_ratio6", "n_stop_kinds", "keep")
      .collect()
    assert(rows.nonEmpty)
    val keeps = rows.count(_.getBoolean(6))
    assert(keeps > 0 && keeps < rows.length,
      s"no filtering signal: $keeps of ${rows.length} kept")
    rows.foreach { r =>
      val expect = r.getLong(1) >= 50 && r.getLong(1) <= 100000 &&
        r.getDouble(2) >= 3.0 && r.getDouble(2) <= 10.0 &&
        r.getDouble(4) <= 0.1 && r.getDouble(3) >= 0.8 && r.getLong(5) >= 2
      // rounded columns can disagree with the unrounded predicate only
      // within 5e-7 of a boundary — assert consistency away from it
      val nearBoundary = Seq(3.0, 10.0).exists(b => math.abs(r.getDouble(2) - b) < 1e-6) ||
        math.abs(r.getDouble(4) - 0.1) < 1e-6 || math.abs(r.getDouble(3) - 0.8) < 1e-6
      if (!nearBoundary)
        assert(r.getBoolean(6) == expect, s"keep mismatch at doc ${r.getLong(0)}: $r")
    }
  }

  test("char stats: crafted entropy/ratio values; corpus keep rule separates") {
    import spark.implicits._
    def statsOf(text: String): org.apache.spark.sql.Row = {
      // t9 reads the documents table; drive the same expressions via a
      // crafted one-row frame written through a temp parquet dir
      val dir = java.nio.file.Files.createTempDirectory("t9spec").toString
      Seq((0L, text, "en", "web", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      graft.queries.TextAnalysis.t9CharStats(spark, dir).collect()(0)
    }
    // "aabb": p = 1/2, 1/2 → entropy ln 2; top frac 1/2
    val r1 = statsOf("aabb")
    assert(r1.getAs[Double]("char_entropy6") ==
      BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r1.getAs[Double]("top_char_frac6") == 0.5)
    assert(r1.getAs[Long]("n_digits") == 0L && r1.getAs[Long]("n_upper") == 0L)
    // single repeated char: entropy 0, top frac 1, not kept
    val r2 = statsOf("zzzzzz")
    assert(r2.getAs[Double]("char_entropy6") == 0.0)
    assert(r2.getAs[Double]("top_char_frac6") == 1.0)
    assert(!r2.getAs[Boolean]("keep"))
    // digits and uppercase counted over non-whitespace denominator
    val r3 = statsOf("A1 b2")
    assert(r3.getAs[Long]("n_digits") == 2L && r3.getAs[Long]("n_upper") == 1L)
    assert(r3.getAs[Double]("digit_ratio6") == 0.5)
    assert(r3.getAs[Double]("upper_ratio6") == 0.25)
    // empty text: all zeros, no NaN
    val r4 = statsOf("")
    assert(r4.getAs[Double]("char_entropy6") == 0.0 &&
      r4.getAs[Double]("top_char_frac6") == 0.0)
    // the corpus separates under the rule (both outcomes occur)
    val keeps = graft.queries.TextAnalysis.t9CharStats(spark, "/root/testdata/sf0.001")
      .select("keep").as[Boolean].collect()
    assert(keeps.exists(identity) && keeps.length > 0)
  }

  test("unigram nll: bounded by rarest/commonest token surprisal, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.TextAnalysis.t8UnigramNll(spark, dir)
      .select("doc_id", "n_tokens", "nll_mean")
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // global surprisal bounds from the corpus unigram distribution
    val counts = graft.sources.Tables.read(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.wsTokens(lower(col("text")))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect()
    val total = counts.map(_._2).sum.toDouble
    val lo = -math.log(counts.map(_._2).max / total)
    val hi = -math.log(counts.map(_._2).min / total)
    rows.foreach { case (id, n, nll) =>
      assert(n > 0 && nll >= lo - 1e-6 && nll <= hi + 1e-6,
        s"doc $id nll $nll outside [$lo, $hi]")
    }
    // docs differ (the score separates, it isn't constant)
    assert(rows.map(_._3).distinct.size > 1)
  }

  test("bm25: term-bearing docs outrank term-free docs; ranks dense, scores non-increasing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark table job"),
      (2L, "spark metrics"),
      (3L, "nothing relevant at all"),
      (4L, "table table table")
    ).toDF("doc_id", "text")
    val r = graft.queries.TextAnalysis.bm25TopK(docs, Seq("spark", "table"), topK = 10)
      .orderBy("rank").collect()
    assert(r.length == 4)
    assert(r.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4))
    val scores = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score6")).toMap
    assert(scores(3L) == 0.0)           // no query term → zero score
    assert(scores(1L) > scores(2L))     // both terms (one twice) beats one hit
    assert(r.last.getAs[Long]("doc_id") == 3L)
    val ordered = r.map(_.getAs[Double]("score6")).toSeq
    assert(ordered == ordered.sorted.reverse)
  }

  test("repetition ratio: repeated 3-grams raise it; short and clean docs are 0") {
    // "a b c" cycled 3x: 7 shingles, 3 distinct → 1 − 3/7
    val cycled = "a b c a b c a b c"
    assert(math.abs(one[Double](repetitionRatio(col("text")), cycled) - (1.0 - 3.0 / 7)) < 1e-12)
    assert(one[Double](repetitionRatio(col("text")), "all distinct words here now") == 0.0)
    assert(one[Double](repetitionRatio(col("text")), "too short") == 0.0)
  }
}
