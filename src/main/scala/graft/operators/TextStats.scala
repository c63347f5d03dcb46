package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for LLM training-data pipelines (north-star surface:
  * language-ID, quality scoring, token counting, fingerprinting) over
  * the `documents` table.
  *
  * Everything is a single narrow projection built from codegen'd
  * built-ins (split/regexp/higher-order array functions) — per-row
  * work, no shuffle, no UDFs. At 100 TB this runs at scan speed with
  * column pruning down to (doc_id, text).
  *
  * The exact expression shapes are mirrored 1:1 in the DuckDB oracle
  * SQL (SparkEntry), so every stat is cross-engine verified.
  */
object TextStats {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language heuristic. Order matters: ties resolve to the earlier
    * language (en > de > fr > es). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "des", "en", "un", "une", "du", "que"),
    "es" -> Seq("el", "los", "de", "y", "en", "un", "una", "que", "es", "no"))

  /** Whitespace tokens of trimmed text; empty OR NULL text → empty
    * array. The NULL guard matters: without it size(split(NULL)) is -1
    * (Spark's legacy sizeOfNull), which corrupts every token-count
    * consumer (packing offsets, source-mix sums, quality rules) and
    * diverges from the DuckDB oracles' CASE, which yields 0. */
  def tokens(text: Column): Column =
    when(coalesce(length(trim(text)), lit(0)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Non-alphanumeric, non-whitespace chars / total chars. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")) / greatest(length(text), lit(1))

  def stopwordRatio(text: Column, stops: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isin(stops: _*))) / greatest(size(t), lit(1))
  }

  /** Composite quality heuristic in [0,1]: reward length (saturating at
    * 100 tokens) and stopword density, penalize punctuation noise. */
  def qualityScore(text: Column): Column =
    least(tokenCount(text) / lit(100.0), lit(1.0)) * 0.4 +
      (lit(1.0) - punctRatio(text)) * 0.3 +
      stopwordRatio(text, Stopwords.head._2) * 0.3

  /** Stopword-profile language ID with fixed-priority tie-break;
    * 'und' (undetermined) when no profile hits. */
  def langId(text: Column): Column = {
    val hits = Stopwords.map { case (lang, stops) =>
      lang -> size(filter(tokens(text), w => w.isin(stops: _*)))
    }
    // CASE chain in profile order: a language wins if its hits are
    // positive and >= every later language's hits.
    hits.zipWithIndex.reverse.foldLeft(lit("und")) { case (elseExpr, ((lang, h), i)) =>
      val later = hits.drop(i + 1).map(_._2)
      val cond = later.foldLeft(h > 0)((c, other) => c && h >= other)
      when(cond, lit(lang)).otherwise(elseExpr)
    }
  }

  /** Bag-of-words document fingerprint: md5 of the sorted distinct
    * token set — invariant to word order and repetition (a cheap
    * canonical form for shuffle-free exact-family dedup). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** BPE-ish token count: subword-style segmentation by regex —
    * contraction suffixes, letter runs, digit runs, punctuation runs
    * (the shape of GPT-2's pre-tokenizer, minus the byte-level step).
    * A closer LLM-cost proxy than whitespace words; pure regexp_count,
    * codegen'd. */
  val BpePattern = "('(?:s|t|re|ve|m|ll|d))|( ?[\\p{L}]+)|( ?[\\p{N}]+)|( ?[^\\s\\p{L}\\p{N}]+)"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Rolling-hash (winnowing-style) fingerprint, PRODUCTION path: the
    * unsigned min of a polynomial rolling hash over the text's `w`-byte
    * windows — a native codegen kernel
    * ([[graft.functions.RollingMinHash]]) doing O(1) work per byte,
    * where the md5 twin below pays one full digest per position (~10k
    * digests for a 10 KB doc — it dominated the whole profile). Same
    * minimizing-window structure → same local-edit robustness; values
    * differ from the twin (different hash picks a different window). */
  def rollingFingerprint(text: Column, w: Int = 16): Column =
    call_function("rolling_min_hash", text, lit(w))

  /** The cross-engine oracle twin of [[rollingFingerprint]]: the
    * lexicographic min of md5 over all char `w`-grams, expressible
    * identically in DuckDB (gated by doc_stats). Texts shorter than `w`
    * hash whole. Twin only — O(len) digests per document. */
  def rollingFingerprintMd5(text: Column, w: Int = 16): Column =
    when(length(text) < w, md5(text)).otherwise(
      array_min(transform(sequence(lit(1), length(text) - (w - 1)),
        i => md5(text.substr(i, lit(w))))))

  /** All stats as one projection over `docs`. The fingerprint column
    * uses the md5 twin when `md5Twin` (the oracle-gated rendition);
    * production profiling uses the native rolling kernel. */
  def profile(docs: DataFrame, textCol: String = "text", md5Twin: Boolean = false): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      tokenCount(t).as("token_count"),
      length(t).as("char_count"),
      round(punctRatio(t), 6).as("punct_ratio"),
      round(stopwordRatio(t, Stopwords.head._2), 6).as("stopword_ratio"),
      round(qualityScore(t), 6).as("quality_score"),
      langId(t).as("predicted_lang"),
      fingerprint(t).as("fingerprint"),
      bpeTokenCount(t).as("bpe_token_count"),
      (if (md5Twin) rollingFingerprintMd5(t).cast("string")
       else rollingFingerprint(t).cast("string")).as("rolling_fingerprint"))
  }

  // ------------------------------------------------------------------
  // Gopher document-quality rules
  // ------------------------------------------------------------------

  /** The Gopher "required words" list (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1): a document must contain at least two of
    * these to pass the stopword rule. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher repetition-free quality-rule battery (Rae et al.
    * 2021, arXiv:2112.11446 §A1.1), re-expressed as ONE codegen'd
    * projection — per-document rules only (the repetition family is
    * covered separately by [[graft.operators.Curation]]'s repetition
    * gate):
    *
    *   1. word count in [minWords, maxWords]
    *   2. mean word length in [3, 10] chars
    *   3. symbol-to-word ratio ('#' and '...') < 0.1
    *   4. > 80% of words contain an alphabetic character
    *   5. >= 2 distinct words from [[GopherStopwords]]
    *   6. <= 90% of lines start with a bullet ('-', '*', '•')
    *   7. <= 30% of lines end with an ellipsis
    *
    * Output: one row per doc with every raw metric, each rule's
    * verdict, and the conjunction (`pass`). Keeping the metrics beside
    * the flags makes threshold sweeps a filter, not a recompute.
    *
    * Scale: narrow projection over (doc_id, text) — scan-speed, no
    * shuffle, whole-stage codegen (split/regexp/higher-order built-ins
    * only). */
  def gopherRules(docs: DataFrame, textCol: String = "text",
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val toks = tokens(col(textCol))
    val wc = size(toks)
    val wcD = greatest(wc, lit(1)).cast("double")
    val meanWordLen = length(regexp_replace(t, "\\s+", "")) / wcD
    val symbolRatio =
      (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))) / wcD
    val alphaFrac =
      size(filter(toks, w => w.rlike("[A-Za-z]"))) / wcD
    val stopHits = size(array_intersect(
      array_distinct(transform(toks, w => lower(w))),
      typedLit(GopherStopwords)))
    val lines = split(t, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val bulletFrac = size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))) / nLines
    val ellipsisFrac = size(filter(lines, l => trim(l).endsWith("..."))) / nLines

    val rWords = wc.between(minWords, maxWords)
    val rMeanLen = meanWordLen.between(3.0, 10.0)
    val rSymbol = symbolRatio < 0.1
    val rAlpha = alphaFrac > 0.8
    val rStop = stopHits >= 2
    val rBullet = bulletFrac <= 0.9
    val rEllipsis = ellipsisFrac <= 0.3

    docs.select(
      col("doc_id"),
      wc.cast("long").as("word_count"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(alphaFrac, 6).as("alpha_frac"),
      stopHits.cast("long").as("stopword_hits"),
      round(bulletFrac, 6).as("bullet_line_frac"),
      round(ellipsisFrac, 6).as("ellipsis_line_frac"),
      rWords.as("r_word_count"),
      rMeanLen.as("r_mean_word_len"),
      rSymbol.as("r_symbol_ratio"),
      rAlpha.as("r_alpha_words"),
      rStop.as("r_stopwords"),
      rBullet.as("r_bullet_lines"),
      rEllipsis.as("r_ellipsis_lines"),
      (rWords && rMeanLen && rSymbol && rAlpha && rStop && rBullet && rEllipsis)
        .as("pass"))
  }

  // ------------------------------------------------------------------
  // Gopher repetition battery
  // ------------------------------------------------------------------

  /** The full Gopher REPETITION rule battery (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1, Table A1) — the other half of the quality
    * gate next to [[gopherRules]]; reference analog: the dedup/DQ
    * stages of scripts/snowflake_queries.sql:25-47 generalized to the
    * published filter.
    *
    * Thirteen metrics per document, thresholds from Table A1
    * (a document PASSES when every fraction is <= its threshold):
    *
    *   - duplicate line / paragraph fraction (by count)      <= 0.30
    *   - duplicate line / paragraph CHARACTER fraction       <= 0.20
    *   - top {2,3,4}-gram character fraction       <= 0.20/0.18/0.16
    *   - duplicate {5..10}-gram character coverage <= 0.15 … 0.10
    *
    * Exact semantics (fixed here so the DuckDB oracle can replay them
    * verbatim):
    *
    *   - lines = '\n'-split of the RAW text, space-trimmed, empties
    *     dropped; paragraphs the same over '\n{2,}'. Duplicate count
    *     fraction = (n - n_distinct)/n; char fraction = (char mass of
    *     all - char mass of distinct)/char mass of all — i.e. every
    *     occurrence beyond the first counts, the repeated value itself
    *     stays.
    *   - word grams ride on the NORMALIZED tokens ([[TextDedup
    *     .normalize]] — lowercase, whitespace collapsed), positions
    *     1-based. Gram char mass EXCLUDES the joining spaces
    *     (length(gram) - (n-1)); the denominator for all gram
    *     fractions is the total token char mass (normalized text minus
    *     spaces), so numerator and denominator measure the same chars.
    *   - top-n-gram coverage = count(gram) * charlen(gram) maximized
    *     over grams (ties: greater gram string — bytewise order, same
    *     in both engines); dup-n-gram coverage = char mass of the
    *     UNION of token positions covered by any occurrence of a gram
    *     appearing more than once (overlaps counted once — the
    *     position-marking rendition, not a per-occurrence sum that
    *     could exceed 1.0).
    *   - verdicts compare the RAW (unrounded) fractions; the projected
    *     columns are rounded to 6dp ([[gopherRules]] discipline).
    *
    * Scale shape: the ENTIRE battery — lines, paragraphs, and all nine
    * gram metrics — is a per-row projection with NO shuffle and no
    * n-gram string ever built: repetition is strictly within-document,
    * so the gram family runs through the native `ngram_rep_mass`
    * kernel ([[graft.functions.NgramRepMass]] — one O(P) hash-count
    * pass per n, prefix-summed char masses), and the whole operator is
    * column-pruned scan work like [[gopherRules]]. The composable
    * explode-grid rendition (9·P rows into per-doc hash aggregates)
    * measured 10-30 s at the 50k smoke; the kernel projection is ~1 s.
    * The cross-engine oracle still replays the grid from first
    * principles in SQL, so the kernel's semantics are gated against an
    * independent string-keyed rendition (hash-vs-string equivalence:
    * duplicateSpans' collision-free contract). */
  def gopherRepetition(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val topThresh = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupThresh = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12,
      9 -> 0.11, 10 -> 0.10)

    val rawT = coalesce(col(textCol), lit(""))
    def nonEmptyTrimmed(arr: Column): Column =
      filter(transform(arr, x => trim(x)), x => length(x) > 0)
    def charMass(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, x) => acc + length(x))

    val toksE = split(TextDedup.normalize(rawT), " ")
    val linesA = nonEmptyTrimmed(split(rawT, "\n"))
    val parasA = nonEmptyTrimmed(split(rawT, "\n{2,}"))
    val joined = docs.select(
      Seq(col("doc_id"),
        length(regexp_replace(TextDedup.normalize(rawT), " ", "")).cast("long").as("cm"),
        size(linesA).as("nl"), size(array_distinct(linesA)).as("ndl"),
        charMass(linesA).as("lc"), charMass(array_distinct(linesA)).as("dlc"),
        size(parasA).as("np"), size(array_distinct(parasA)).as("ndp"),
        charMass(parasA).as("pc"), charMass(array_distinct(parasA)).as("dpc"),
        toksE.as("__toks")): _*)
      .select(
        Seq(col("doc_id"), col("cm"), col("nl"), col("ndl"), col("lc"), col("dlc"),
          col("np"), col("ndp"), col("pc"), col("dpc")) ++
          topNs.map(n => element_at(
            call_function("ngram_rep_mass", col("__toks"), lit(n)), 1).as(s"top_$n")) ++
          dupNs.map(n => element_at(
            call_function("ngram_rep_mass", col("__toks"), lit(n)), 2).as(s"dup_$n")): _*)

    val cmD = greatest(col("cm"), lit(1L)).cast("double")
    val dupLine = (col("nl") - col("ndl")).cast("double") / greatest(col("nl"), lit(1))
    val dupPara = (col("np") - col("ndp")).cast("double") / greatest(col("np"), lit(1))
    val dupLineCh = (col("lc") - col("dlc")).cast("double") / greatest(col("lc"), lit(1L))
    val dupParaCh = (col("pc") - col("dpc")).cast("double") / greatest(col("pc"), lit(1L))
    def frac(c: String): Column = coalesce(col(c), lit(0L)).cast("double") / cmD

    val rules =
      (dupLine <= 0.30) && (dupPara <= 0.30) &&
        (dupLineCh <= 0.20) && (dupParaCh <= 0.20) &&
        topNs.map(n => frac(s"top_$n") <= topThresh(n)).reduce(_ && _) &&
        dupNs.map(n => frac(s"dup_$n") <= dupThresh(n)).reduce(_ && _)

    joined.select(
      Seq(col("doc_id"),
        round(dupLine, 6).as("dup_line_frac"),
        round(dupPara, 6).as("dup_para_frac"),
        round(dupLineCh, 6).as("dup_line_char_frac"),
        round(dupParaCh, 6).as("dup_para_char_frac")) ++
        topNs.map(n => round(frac(s"top_$n"), 6).as(s"top_${n}gram_char_frac")) ++
        dupNs.map(n => round(frac(s"dup_$n"), 6).as(s"dup_${n}gram_char_frac")) :+
        rules.as("pass"): _*)
  }
}
