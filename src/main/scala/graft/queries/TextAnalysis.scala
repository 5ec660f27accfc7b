package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/**
 * Text-analysis queries over the `documents` table (north-star
 * extension; TESTDATA.md). Pure per-row columnar transforms — at
 * 100 TB these run as one parquet scan with whole-stage codegen, no
 * shuffle, no UDFs. Each query has an exact DuckDB twin in [[oracle]].
 */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents")

  /** Token accounting: whitespace tokens and the BPE-ish subword proxy. */
  def t1TokenStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      col("n_chars"),
      tokenCount(col("text")).cast("long").as("ws_tokens"),
      bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))

  /** Quality signals + folded score. */
  def t2Quality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      round(punctRatio(col("text")), 6).as("punct_ratio"),
      round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
      round(meanTokenLen(col("text")), 6).as("mean_token_len"),
      qualityScore(col("text")).as("quality"))

  /** Marker-based language heuristic with per-language counts. */
  def t3LangId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      Seq(col("doc_id"), langGuess(col("text")).as("lang_guess")) ++
        LangMarkers.map { case (code, ms) =>
          langMarkerCount(col("text"), ms).cast("long").as(s"c_$code")
        }: _*)

  /** Normalized md5 + rolling-min-hash fingerprints. */
  def t4Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      normalizedFingerprint(col("text")).as("fp_norm"),
      rollingMinHash(col("text")).as("fp_rolling"))

  /** Intra-doc 3-gram repetition (Gopher boilerplate signal). */
  def t5Repetition(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.dedup.Dedup.wordShingles(col("text"))
    docs(spark, dir).select(
      col("doc_id"),
      size(sh).cast("long").as("n_grams"),
      size(array_distinct(sh)).cast("long").as("n_distinct"),
      round(repetitionRatio(col("text")), 6).as("rep_ratio"))
  }

  /** Stopword-presence list for the Gopher R5 rule ("contains at
    * least two distinct stopwords"). The paper's own list (the, be,
    * to, of, and, that, have, with — Rae et al. 2021 §A1.1) is tuned
    * for web English; the engine keys the rule off its shared
    * [[graft.functions.TextFunctions.EnStopwords]] list so the rule
    * and the t2 stopword-ratio signal agree on what a stopword is —
    * the LIST is configuration, the RULE (≥ 2 distinct present) is
    * Gopher's. */
  private val GopherStops = graft.functions.TextFunctions.EnStopwords

  /** Gopher document-filter rules (Rae et al. 2021, appendix A1.1) as
    * a per-doc rule audit + keep decision: word count in [50, 100k],
    * mean word length in [3, 10], symbol-to-word ratio ≤ 0.1 (# and
    * ellipsis), ≥ 80% of words contain an alphabetic character, and
    * ≥ 2 distinct stopwords present. (The bullet/ellipsis LINE-ratio
    * rules need line structure the corpus lacks — no newlines — and
    * are deliberately out.) Pure per-row map like the rest of the
    * layer; the keep predicate compares the identical IEEE quotients
    * in both engines, so the boolean is portable without margins. */
  def t7GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(lower(col("text")))
    val nW = size(toks).cast("long")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _)
    val meanLen = when(nW === 0, lit(0.0)).otherwise(sumLen.cast("double") / nW)
    val alphaRatio = when(nW === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nW)
    val symRatio = when(nW === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(col("text"), lit("#|\\.\\.\\."), lit(0))).cast("double") / nW)
    val stopKinds = GopherStops.map(w =>
      when(array_contains(toks, w), 1L).otherwise(0L)).reduce(_ + _)
    docs(spark, dir).select(
      col("doc_id"),
      nW.as("n_words"),
      round(meanLen, 6).as("mean_word_len6"),
      round(alphaRatio, 6).as("alpha_ratio6"),
      round(symRatio, 6).as("symbol_ratio6"),
      stopKinds.as("n_stop_kinds"),
      (nW >= 50 && nW <= 100000 &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        symRatio <= 0.1 && alphaRatio >= 0.8 &&
        stopKinds >= 2).as("keep"))
  }

  /** Language-model quality scoring, unigram form (the CCNet move —
    * Wenzek et al. 2020 — with the KenLM replaced by the corpus's own
    * unigram distribution): score each document by the mean negative
    * log-likelihood of its tokens under p(t) = count(t)/total. Low
    * nll ≈ repetitive/common-word text, high nll ≈ rare-token text —
    * the standard perplexity-proxy axis for corpus filtering.
    *
    * Portability: p is an exact integer ratio; the per-token -ln p
    * terms are summed in POSITION order on both sides (Spark:
    * array_sort(collect_list(struct(pos, term))) folded left-to-right;
    * DuckDB: list(term ORDER BY pos) → list_sum), so the only
    * cross-engine noise is ln()'s ulp — absorbed by ROUND(,6) on
    * fixed data, same argument as the m2 entropy twin.
    *
    * Scale posture: one shuffle to count tokens (map-side combined,
    * vocabulary-sized output), the 1-row total broadcast, the
    * count-join on token (vocabulary-sized build side — Catalyst
    * broadcasts it when small), and a per-doc fold whose state is
    * bounded by document length. No corpus-wide sort.
    */
  def t8UnigramNll(spark: SparkSession, dir: String): DataFrame = {
    val tk = docs(spark, dir)
      .select(col("doc_id"), posexplode(wsTokens(lower(col("text")))).as(Seq("pos", "tok")))
    val counts = tk.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total"))
    tk.join(counts, Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("term", -log(col("c").cast("double") / col("total")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        aggregate(
          array_sort(collect_list(struct(col("pos"), col("term")))),
          lit(0.0),
          (acc, x) => acc + x.getField("term")).as("nll"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("nll") / col("n_tokens"), 6).as("nll_mean"))
  }

  /** PII counts + redacted-text digest (pre-packing scrub pass). */
  def t6PiiScrub(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      piiCount(col("text"), EmailRe).cast("long").as("n_emails"),
      piiCount(col("text"), SsnRe).cast("long").as("n_ssns"),
      piiCount(col("text"), Ipv4Re).cast("long").as("n_ips"),
      piiCount(col("text"), PhoneRe).cast("long").as("n_phones"),
      piiCount(col("text"), AddressRe).cast("long").as("n_addresses"),
      md5(piiScrub(col("text"))).as("scrub_md5"))

  // --- DuckDB twins -----------------------------------------------------
  // DuckDB regexp_replace needs the 'g' flag (Spark's is global by
  // default); list lambdas mirror Spark's higher-order functions.

  private val toksSql =
    """CASE WHEN length(trim(text)) = 0 THEN []
      | ELSE string_split_regex(trim(text), '\s+') END""".stripMargin
  private def swInList(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")
  private val swCountSql =
    s"len(list_filter(list_transform($toksSql, t -> lower(t)), t -> t IN (${swInList(graft.functions.TextFunctions.EnStopwords)})))"
  private val nToksSql = s"len($toksSql)"
  private val shinglesSql =
    s"""CASE WHEN len($toksSql) - 2 <= 0 THEN CAST([] AS VARCHAR[])
       | ELSE list_transform(generate_series(1, len($toksSql) - 2),
       |   i -> array_to_string(($toksSql)[i:i+2], ' ')) END""".stripMargin
  private val punctSql =
    s"""CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0 THEN 0.0
       | ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
       |      / length(regexp_replace(text, '\\s', '', 'g')) END""".stripMargin
  private val swRatioSql =
    s"CASE WHEN $nToksSql = 0 THEN 0.0 ELSE $swCountSql::DOUBLE / $nToksSql END"
  private val mtlSql =
    s"""CASE WHEN $nToksSql = 0 THEN 0.0
       | ELSE list_sum(list_transform($toksSql, t -> length(t)))::DOUBLE / $nToksSql END""".stripMargin

  private def markerCountSql(words: Seq[String]) =
    s"len(list_filter(list_transform($toksSql, t -> lower(t)), t -> t IN (${swInList(words)})))"

  val oracle: Map[String, String] = {
    val langCounts = LangMarkers.map { case (code, ms) =>
      s"${markerCountSql(ms)} AS c_$code"
    }.mkString(", ")
    val best = "greatest(" + LangMarkers.map { case (c, _) => s"c_$c" }.mkString(", ") + ")"
    val guess = LangMarkers.map(_._1).sorted
      .map(c => s"WHEN c_$c = $best AND $best > 0 THEN '$c'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    Map(
      "t1_token_stats" ->
        s"""SELECT doc_id, n_chars, $nToksSql::BIGINT AS ws_tokens,
           | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT AS bpe_tokens
           |FROM documents""".stripMargin,
      "t2_quality" ->
        s"""SELECT doc_id,
           | ROUND($punctSql, 6) AS punct_ratio,
           | ROUND($swRatioSql, 6) AS stopword_ratio,
           | ROUND($mtlSql, 6) AS mean_token_len,
           | ROUND(least(1.0, $nToksSql::DOUBLE / 50.0) * 0.3
           |   + (1.0 - $punctSql) * 0.3
           |   + least(1.0, $swRatioSql * 4.0) * 0.2
           |   + (CASE WHEN $mtlSql >= 3.0 AND $mtlSql <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2,
           |  6) AS quality
           |FROM documents""".stripMargin,
      "t3_lang_id" ->
        s"""SELECT doc_id, $guess AS lang_guess,
           | ${LangMarkers.map { case (c, _) => s"c_$c::BIGINT AS c_$c" }.mkString(", ")}
           |FROM (SELECT doc_id, $langCounts FROM documents)""".stripMargin,
      "t4_fingerprint" ->
        s"""SELECT doc_id,
           | md5(regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+', ' ', 'g')) AS fp_norm,
           | CASE WHEN length(text) - 7 <= 0 THEN NULL
           |  ELSE list_min(list_transform(generate_series(1, length(text) - 7),
           |    i -> md5(substr(text, i::INTEGER, 8)))) END AS fp_rolling
           |FROM documents""".stripMargin,
      "t5_repetition" ->
        s"""SELECT doc_id, len(sh)::BIGINT AS n_grams,
           | len(list_distinct(sh))::BIGINT AS n_distinct,
           | ROUND(CASE WHEN len(sh) <= 0 THEN 0.0
           |   ELSE 1.0 - len(list_distinct(sh))::DOUBLE / len(sh) END, 6) AS rep_ratio
           |FROM (SELECT doc_id, $shinglesSql AS sh FROM documents)""".stripMargin,
      "t7_gopher_rules" -> {
        val lowToks =
          """CASE WHEN length(trim(lower(text))) = 0 THEN []
            | ELSE string_split_regex(trim(lower(text)), '\s+') END""".stripMargin
        val stopsSum = GopherStops
          .map(w => s"CAST(list_contains(toks, '$w') AS BIGINT)").mkString(" + ")
        s"""WITH d AS (SELECT doc_id, text, $lowToks AS toks FROM documents),
           |m AS (SELECT doc_id,
           |  CAST(len(toks) AS BIGINT) AS n_words,
           |  CASE WHEN len(toks) = 0 THEN 0.0
           |    ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
           |         / len(toks) END AS mean_len,
           |  CASE WHEN len(toks) = 0 THEN 0.0
           |    ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
           |         / len(toks) END AS alpha_ratio,
           |  CASE WHEN len(toks) = 0 THEN 0.0
           |    ELSE CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
           |         / len(toks) END AS sym_ratio,
           |  CAST($stopsSum AS BIGINT) AS n_stop_kinds
           | FROM d)
           |SELECT doc_id, n_words,
           |  ROUND(mean_len, 6) AS mean_word_len6,
           |  ROUND(alpha_ratio, 6) AS alpha_ratio6,
           |  ROUND(sym_ratio, 6) AS symbol_ratio6,
           |  n_stop_kinds,
           |  (n_words >= 50 AND n_words <= 100000
           |   AND mean_len >= 3.0 AND mean_len <= 10.0
           |   AND sym_ratio <= 0.1 AND alpha_ratio >= 0.8
           |   AND n_stop_kinds >= 2) AS keep
           |FROM m""".stripMargin
      },
      "t8_unigram_nll" -> {
        val lowToks =
          """CASE WHEN length(trim(lower(text))) = 0 THEN []
            | ELSE string_split_regex(trim(lower(text)), '\s+') END""".stripMargin
        s"""WITH d AS (SELECT doc_id, $lowToks AS toks FROM documents),
           |tk AS (SELECT doc_id, i AS pos, toks[i::INTEGER] AS tok
           |  FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)),
           |c AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
           |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c),
           |s AS (SELECT doc_id, count(*) AS n,
           |  list_sum(list(-ln(c.c::DOUBLE / tot.total) ORDER BY tk.pos)) AS nll
           | FROM tk JOIN c USING (tok) CROSS JOIN tot GROUP BY doc_id)
           |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           |  ROUND(nll / n, 6) AS nll_mean
           |FROM s""".stripMargin
      },
      "t6_pii_scrub" -> {
        // DuckDB single-quoted literals pass backslashes through
        // verbatim, so the Scala pattern strings interpolate as-is
        val email = graft.functions.TextFunctions.EmailRe
        val ssn = graft.functions.TextFunctions.SsnRe
        val ip = graft.functions.TextFunctions.Ipv4Re
        val phone = graft.functions.TextFunctions.PhoneRe
        val addr = graft.functions.TextFunctions.AddressRe
        s"""SELECT doc_id,
           | len(regexp_extract_all(text, '$email'))::BIGINT AS n_emails,
           | len(regexp_extract_all(text, '$ssn'))::BIGINT AS n_ssns,
           | len(regexp_extract_all(text, '$ip'))::BIGINT AS n_ips,
           | len(regexp_extract_all(text, '$phone'))::BIGINT AS n_phones,
           | len(regexp_extract_all(text, '$addr'))::BIGINT AS n_addresses,
           | md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
           |   '$email', '<EMAIL>', 'g'),
           |   '$addr', '<ADDR>\\3', 'g'),
           |   '$ssn', '<SSN>', 'g'),
           |   '$ip', '<IP>', 'g'),
           |   '$phone', '<PHONE>', 'g')) AS scrub_md5
           |FROM documents""".stripMargin
      }
    )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_token_stats" -> (t1TokenStats _),
    "t2_quality" -> (t2Quality _),
    "t3_lang_id" -> (t3LangId _),
    "t4_fingerprint" -> (t4Fingerprint _),
    "t5_repetition" -> (t5Repetition _),
    "t6_pii_scrub" -> (t6PiiScrub _),
    "t7_gopher_rules" -> (t7GopherRules _),
    "t8_unigram_nll" -> (t8UnigramNll _)
  )
}
