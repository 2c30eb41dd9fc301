package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (north-star extension):
  * tokenization, token counting, n-gram shingles, language-ID heuristic,
  * quality scoring, document fingerprinting.
  *
  * Everything is built from codegen'd native functions (no UDFs), so these
  * run inside whole-stage codegen over a 100 TB documents scan.
  */
object TextOps {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single
    * punctuation — approximates an LLM tokenizer's pre-split. */
  val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpeishPattern), lit(0)))

  /** Word n-gram shingles (distinct), the unit for MinHash / Jaccard. */
  def shingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    array_distinct(
      transform(sequence(lit(0), greatest(size(ts) - n, lit(0))),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }

  /** Character n-gram shingles (distinct). */
  def charShingles(text: Column, n: Int): Column = {
    array_distinct(
      transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => text.substr(i, lit(n))))
  }

  // --- language ID (stopword-overlap heuristic) -----------------------
  // Tiny per-language stopword lists; score = |tokens ∩ stopwords| /
  // |tokens|, prediction = argmax (ties broken by language code order via
  // struct max). This is the classic cheap n-gram/stopword LID — a real
  // deployment would swap in fastText-style profiles, but the Spark shape
  // (pure column expressions, broadcastable literals) is the same.
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "that", "for", "it", "with", "as", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "del", "las", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "sich", "auf", "ist"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "que", "est", "pour"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "ren", "you", "wo", "ta", "zhe", "men", "lai"))

  /** Lowercased tokens — compute ONCE and feed the *FromTokens variants
    * when scoring several languages: higher-order functions evaluate
    * interpreted, so Spark's subexpression elimination does not collapse
    * repeated tokenizations across 10 scoring expressions. */
  def lowerTokens(text: Column): Column = transform(tokens(text), t => lower(t))

  def langScoreFromTokens(toksLower: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    size(array_intersect(toksLower, sw)).cast("double") /
      greatest(size(toksLower), lit(1)).cast("double")
  }

  def langScore(text: Column, lang: String): Column =
    langScoreFromTokens(lowerTokens(text), lang)

  /** Predicted language code (argmax stopword overlap; "und" if no
    * stopword hits at all). */
  def langIdFromTokens(toksLower: Column): Column = {
    val scored = array(stopwords.keys.toSeq.sorted.map(l =>
      struct(langScoreFromTokens(toksLower, l).as("score"), lit(l).as("lang"))): _*)
    val best = array_max(scored)
    when(best.getField("score") === 0.0, lit("und")).otherwise(best.getField("lang"))
  }

  def langId(text: Column): Column = langIdFromTokens(lowerTokens(text))

  // --- quality scoring ------------------------------------------------

  /** Gopher-style quality components, each in [0,1]. Pass a precomputed
    * [[lowerTokens]] column to avoid re-tokenizing per component. */
  def qualityComponentsFromTokens(text: Column, toksLower: Column): Seq[(String, Column)] = {
    val n = greatest(size(toksLower), lit(1)).cast("double")
    val nonSpaceLen = greatest(length(regexp_replace(text, "\\s", "")), lit(1)).cast("double")
    Seq(
      // mean token length inside the "natural language" band [3, 10]
      "word_len_ok" -> when((nonSpaceLen / n).between(3.0, 10.0), 1.0).otherwise(0.0),
      // stopword presence: any-language stopword hit ratio, capped
      "stopword_ratio" -> least(lit(1.0),
        stopwords.keys.toSeq.sorted.map(l => langScoreFromTokens(toksLower, l))
          .reduce(_ + _) * 2.0),
      // fraction of alphabetic characters
      "alpha_ratio" ->
        length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
          greatest(length(text), lit(1)).cast("double"),
      // lexical diversity: distinct tokens / tokens (low => boilerplate)
      "distinct_ratio" -> size(array_distinct(toksLower)).cast("double") / n,
      // length in a sane document band
      "len_ok" -> when(length(text).between(20, 1000000), 1.0).otherwise(0.0))
  }

  def qualityComponents(text: Column): Seq[(String, Column)] =
    qualityComponentsFromTokens(text, lowerTokens(text))

  /** Scalar quality score: mean of the components. */
  def qualityScoreFromTokens(text: Column, toksLower: Column): Column = {
    val comps = qualityComponentsFromTokens(text, toksLower).map(_._2)
    comps.reduce(_ + _) / comps.size
  }

  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(text, lowerTokens(text))

  // --- fingerprinting -------------------------------------------------

  /** Winnowing-style document fingerprint: minimum xxhash64 over all
    * character k-grams — robust to reordering at the edges, cheap to
    * compare for containment/near-equality at scale. */
  def minHashFingerprint(text: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => xxhash64(text.substr(i, lit(k)))))

  /** Polynomial rolling hash of the whole document (order-sensitive):
    * h = (h*31 + code(c)) mod P with P < 2^40, so the multiply never
    * overflows a long (Spark 4 runs ANSI arithmetic by default). */
  def rollingHash(text: Column): Column = {
    val P = 1099511627689L // prime < 2^40
    aggregate(split(text, ""), lit(0L),
      (h, c) => pmod(h * 31L + ascii(c).cast("long"), lit(P)))
  }

  // --- repetition / boilerplate signals ---------------------------------

  /** Word n-grams WITHOUT dedup — repetition analysis needs gram
    * multiplicity ([[shingles]] dedupes for Jaccard). Empty array when
    * the doc has fewer than n tokens, so no null-padded grams exist in
    * either engine. */
  def ngramsAll(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ts, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of non-blank lines that are duplicates of an earlier line
    * — a boilerplate signal (repeated headers/footers/navigation). */
  def duplicateLineFraction(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > lit(0))
    when(size(lines) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines).cast("double"))
  }

  /** Share of all word n-grams taken by the single most frequent one as
    * a single column expression. O(|grams|²) interpreted HOF per row —
    * ONLY for short strings (titles, lines); at document scale use
    * [[topNgramFractions]], which is codegen + grouped (the m² form
    * cost 94 s over sf0.1 documents vs ~1 s grouped). */
  def topNgramFraction(text: Column, n: Int): Column = {
    val grams = ngramsAll(text, n)
    when(size(grams) === 0, lit(0.0)).otherwise(
      array_max(transform(grams, g => size(filter(grams, x => x === g))))
        .cast("double") / size(grams).cast("double"))
  }

  /** Per-document top-n-gram share the scalable way: explode grams with
    * multiplicity, count per (doc, gram) with map-side partials, then
    * max/sum per doc — every step whole-stage codegen, shuffles carry
    * (doc, gram hash) counts. Docs with no n-grams are absent from the
    * output (join back with a 0.0 default). Returns
    * (idCol, top{n}gram_frac). */
  def topNgramFractions(df: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(ngramsAll(col(textCol), n)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg((max(col("__c")).cast("double") / sum(col("__c")).cast("double"))
        .as(s"top${n}gram_frac"))

  // --- PII scrubbing ----------------------------------------------------

  /** Patterns shared with the DuckDB oracle (ASCII classes only, so the
    * Java and RE2 regex dialects agree). URLs are scrubbed before emails
    * (a URL can embed an @) and digit runs last (URLs/emails contain
    * digits). */
  val urlPattern = "https?://[^\\s]+"
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longNumPattern = "\\d{6,}"

  /** Scrub URLs / emails / long digit runs (ids, phone-ish numbers) to
    * typed placeholder tokens — the standard pre-training cleanup pass.
    * Pure codegen regexp_replace chain, no UDF. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlPattern, "[URL]"),
        emailPattern, "[EMAIL]"),
      longNumPattern, "[NUM]")
}
