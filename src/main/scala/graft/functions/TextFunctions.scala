package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for large-scale training-data
 * pipelines (north-star extension — no reference counterpart;
 * BASELINE.json). Everything is built from codegen'd Catalyst builtins
 * (split/transform/aggregate/regexp/md5) — no Scala UDFs — so the
 * whole pipeline stays inside whole-stage codegen and scales linearly
 * with a parquet scan: no shuffle, no state, embarrassingly parallel
 * per row at 100 TB.
 *
 * Every function has an exact DuckDB-SQL twin (TextAnalysis.oracle) so
 * the driver's oracle gate hash-verifies the semantics.
 */
object TextFunctions {

  /** Whitespace tokens of trimmed text ([] for blank input). */
  def wsTokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish subword proxy count: runs of letters, single digits, or
    * single non-alphanumeric marks — the GPT-2 pre-tokenizer's shape
    * without the merges table. A cheap, deterministic proxy for "how
    * many tokens would a BPE tokenizer spend here". */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Ratio of punctuation characters to all non-space characters. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val punct = length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    when(nonSpace === 0, lit(0.0)).otherwise(punct.cast("double") / nonSpace)
  }

  /** English-ish stopword list used by the quality score and the
    * language heuristic; tiny by design (markers, not coverage). */
  val EnStopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "in", "to", "is")

  def stopwordCount(text: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(wsTokens(lower(text)), t => array_contains(sw, t)))
  }

  /** Stopword fraction of all whitespace tokens. */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(stopwordCount(text).cast("double") / n)
  }

  /** Mean whitespace-token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = wsTokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks))
  }

  /**
   * Heuristic document quality in [0,1] — the usual pretraining-corpus
   * filters (length, punctuation burden, stopword signal, word shape)
   * folded into one deterministic score:
   *   0.3·min(1, tokens/50) + 0.3·(1−punct_ratio)
   * + 0.2·min(1, 4·stopword_ratio) + 0.2·(mean_token_len in [3,12]).
   */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(lit(1.0), tokenCount(text).cast("double") / 50.0)
    val punctTerm = lit(1.0) - punctRatio(text)
    val swTerm = least(lit(1.0), stopwordRatio(text) * 4.0)
    val mtl = meanTokenLen(text)
    val shapeTerm = when(mtl >= 3.0 && mtl <= 12.0, lit(1.0)).otherwise(lit(0.0))
    round(lenTerm * 0.3 + punctTerm * 0.3 + swTerm * 0.2 + shapeTerm * 0.2, 6)
  }

  /** Marker stopwords per language for the n-gram/stopword language
    * heuristic. Deterministic argmax; ties resolve by language code
    * ascending ('und' = undetermined when every count is zero). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "en" -> Seq("the", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "los", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"))

  def langMarkerCount(text: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(wsTokens(lower(text)), t => array_contains(m, t)))
  }

  /** Language guess via marker-word argmax (deterministic tie-break:
    * first language in code order wins; all-zero → 'und'). */
  def langGuess(text: Column): Column = {
    val counts = LangMarkers.map { case (code, ms) => (code, langMarkerCount(text, ms)) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    // when-chain in code order: earliest language with count == max wins
    counts.sortBy(_._1).foldRight(lit("und")) { case ((code, c), acc) =>
      when(c === best && best > 0, lit(code)).otherwise(acc)
    }
  }

  /** Exact-dedup fingerprint: md5 of casefolded text with punctuation
    * stripped and whitespace collapsed — robust to formatting-only
    * variation. */
  def normalizedFingerprint(text: Column): Column =
    md5(regexp_replace(trim(regexp_replace(lower(text), "[^a-z0-9\\s]", " ")), "\\s+", " "))

  /** Rolling-hash document fingerprint: the lexicographic minimum of
    * md5 over all character k-grams (winnowing's min-selection over a
    * dense rolling window). Near-identical documents share it with
    * high probability; null for texts shorter than k. */
  def rollingMinHash(text: Column, k: Int = 8): Column = {
    val n = length(text) - (k - 1)
    when(n <= 0, lit(null).cast("string"))
      .otherwise(array_min(transform(sequence(lit(1), n), i => md5(text.substr(i, lit(k))))))
  }

  /** Intra-document n-gram repetition ratio (the Gopher / RefinedWeb
    * quality signal for boilerplate and degenerate generation):
    * 1 − distinct/total over word n-grams; 0.0 for docs shorter than
    * n tokens. Shuffle-free per-row arithmetic. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = graft.dedup.Dedup.wordShingles(text, n)
    when(size(sh) <= 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
  }

  // --- PII scrubbing ------------------------------------------------------
  // Patterns are deliberately dialect-portable: no \b, no lookaround,
  // no possessive quantifiers — identical leftmost-first matches under
  // Java regex (Spark codegen) and RE2 (the DuckDB twin). Scrub order
  // is email → IPv4 → phone: earlier placeholders contain no digits,
  // so later passes cannot re-match inside them.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+?[0-9][0-9() \\-]{7,}[0-9]"
  // street-number + 1-2 capitalized words + a street-type suffix.
  // Dialect-portable (no \b / lookaround) like the rest of the family,
  // so the trailing word boundary is a CONSUMED third group — without
  // it "St" would match inside "Store"/"Ln" inside "Lnot" etc.; the
  // scrub re-emits the consumed delimiter via a backreference.
  val AddressRe =
    "[0-9]{1,5} [A-Z][a-z]+( [A-Z][a-z]+)? " +
      "(Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Lane|Ln|Drive|Dr|Court|Ct|Place|Pl)" +
      "\\.?([^A-Za-z]|$)"

  /** Count of pattern matches in the text (0 for none). Counts are per
    * pattern over the RAW text: an SSN-shaped run also matches the
    * (looser) phone pattern, so n_ssns and n_phones can overlap — the
    * scrub chain resolves the overlap by running the tighter SSN
    * replacement first. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Text with emails, SSN-shaped ids, IPv4 addresses, and phone-shaped
    * digit runs replaced by typed placeholders — the standard redaction
    * pass a training pipeline runs before packing (per-row
    * regexp_replace chain, shuffle-free, codegen'd). Tighter patterns
    * run first; placeholders contain no digits, so later passes cannot
    * re-match inside them. */
  def piiScrub(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    // address BEFORE the digit-run patterns: PhoneRe's char class
    // includes spaces, so a phone preceding a street number would
    // absorb the number ("...0142 99 Mountain View Rd" → the 99)
    // and strand the street name; scrubbed first, the address
    // placeholder carries no digits for later passes to eat. The
    // consumed boundary (group 3) is re-emitted.
    val a = regexp_replace(e, AddressRe, "<ADDR>$3")
    val s = regexp_replace(a, SsnRe, "<SSN>")
    val i = regexp_replace(s, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }
}
