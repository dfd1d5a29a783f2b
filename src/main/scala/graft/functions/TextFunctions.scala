package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column expressions for large-scale document pipelines:
  * token counting, quality scoring, language ID, shingling, MinHash and
  * SimHash fingerprints. All are composed from built-ins
  * (`org.apache.spark.sql.functions`) — no UDFs, so nothing crosses a
  * serialization boundary and everything scales linearly with no shuffle
  * of its own. Scalar expressions ride whole-stage codegen; the
  * higher-order array folds (`transform`/`filter`/`aggregate`) evaluate
  * through Catalyst's interpreted path but remain inside the same stage.
  */
object TextFunctions {

  /** Whitespace-delimited tokens. `regexp_extract_all('\S+')` rather than
    * `split` so empty strings yield an empty array with no edge cases.
    */
  /** Whitespace tokens — natively ([[SketchExpressions.whitespaceTokens]]:
    * one byte scan, no regex engine, no per-match String). Equal to
    * [[tokensBuiltin]], pinned in FunctionsSpec.
    */
  def tokens(c: Column): Column = SketchExpressions.whitespaceTokens(c)

  /** The regex formulation, kept as the parity reference (and the shape
    * the oracle SQL replays).
    */
  def tokensBuiltin(c: Column): Column = regexp_extract_all(c, lit("\\S+"), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish token counting: letter runs, digit runs, and lone symbols each
    * count as a token — a cheap proxy for subword tokenizer budgets that,
    * unlike whitespace counting, bills punctuation and number-heavy text.
    */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c)).cast("long")

  def charCount(c: Column): Column = length(c).cast("long")

  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.,;:!?]"), lit(0))).cast("long")

  /** English stopword hits (tiny fixed set, word-boundary matched). */
  val EnglishStopwords: Seq[String] = Seq("the", "and", "of", "to", "in", "is", "a")

  /** Gopher §A1.1's required stopword set (the keep rule demands ≥ 2 hits). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def stopwordCount(c: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    size(regexp_extract_all(lower(c), lit("\\b(" + stopwords.mkString("|") + ")\\b"), lit(0)))
      .cast("long")

  /** Ratio helpers are null when the denominator is zero (reference §1.4
    * semantics: 0/0 and x/0 become NA, never NaN/Inf). Left unrounded:
    * per-row IEEE division is bit-identical across engines, while rounding
    * introduces half-tie divergence.
    */
  private def ratio(num: Column, den: Column): Column =
    when(den === 0 || den.isNull, lit(null)).otherwise(num / den)

  def punctRatio(c: Column): Column = ratio(punctCount(c), charCount(c))

  def stopwordRatio(c: Column): Column = ratio(stopwordCount(c), tokenCount(c))

  def avgTokenLen(c: Column): Column =
    ratio(size(regexp_extract_all(c, lit("\\S"), lit(0))).cast("long"), tokenCount(c))

  /** Heuristic document quality in [0,1]: long enough, not punctuation soup,
    * has function words. Fixed left-associated double arithmetic so an
    * external oracle reproduces it bit-for-bit without rounding.
    */
  def qualityScore(c: Column): Column = {
    val lenScore  = least(tokenCount(c).cast("double") / lit(100.0), lit(1.0))
    val punctPen  = coalesce(punctRatio(c).cast("double"), lit(0.0))
    val stopScore = coalesce(stopwordRatio(c).cast("double"), lit(0.0))
    lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - punctPen) + lit(0.3) * stopScore
  }

  /** N-gram language ID: score per language = stopword hit-rate for that
    * language's marker set; winner takes the label. Pure `when`-chain.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "que", "y"),
  )

  def langScores(c: Column): Map[String, Column] =
    LangMarkers.map { case (lang, words) => lang -> stopwordCount(c, words) }

  def langId(c: Column): Column = {
    val scores = langScores(c).toSeq.sortBy(_._1) // deterministic tie-break: alphabetical
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(best > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Word k-shingles as strings ("w1 w2 ... wk"); documents shorter than k
    * yield an empty array. Routed through the native expression (the
    * string-building dominates MinHash cost otherwise); the built-in
    * formulation below is the parity reference.
    */
  def wordShingles(c: Column, k: Int): Column =
    SketchExpressions.wordShingles(tokens(c), k)

  def wordShinglesBuiltin(c: Column, k: Int): Column = {
    val ts = tokens(c)
    when(size(ts) < k, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), size(ts) - lit(k - 1)),
        i => concat_ws(" ", slice(ts, i, lit(k)))
      )
    )
  }

  /** Canonical text for dedup/fingerprint pipelines: Unicode NFC (so
    * composed and decomposed accents hash identically), lowercase,
    * whitespace collapsed to single spaces, trimmed. Run BEFORE MinHash/
    * SimHash/exact-hash dedup — without it, byte-level variants of the
    * same text land in different buckets. The NFC step is the native
    * codegen expression in [[NormalizeExpressions]].
    */
  def cleanText(c: Column): Column =
    trim(regexp_replace(lower(NormalizeExpressions.normalizeUnicode(c, "NFC")),
      "\\s+", " "))

  // ---- repetition / quality-filter signals (Gopher §A1.1, C4 §2.2 — the
  // published heuristics for dropping machine-generated or boilerplate
  // text from a training corpus). All are per-row array arithmetic over
  // the document's own tokens/lines: zero shuffle, embarrassingly
  // parallel, linear in corpus size at any scale. ----

  /** Non-empty lines of a document (trailing-newline artifacts dropped). */
  def docLines(c: Column): Column = SketchExpressions.nonEmptyLines(c)

  /** The built-in formulation of [[docLines]] — the parity reference. */
  def docLinesBuiltin(c: Column): Column =
    filter(split(c, "\n"), l => length(l) > 0)

  /** Fraction of lines that are duplicates of an earlier line:
    * (n_lines - n_distinct_lines) / n_lines, null for empty documents.
    */
  def dupLineFraction(c: Column): Column = dupLineFractionOf(docLines(c))

  def dupLineFractionOf(ls: Column): Column =
    ratio(size(ls) - size(array_distinct(ls)), size(ls))

  /** Order-preserving first-occurrence filter over an array column — the
    * within-document repetition-removal primitive (C4's duplicate-line
    * drop, applied to whatever unit the caller staged: lines, sentences,
    * tokens). Keeps element i iff no earlier element equals it; null
    * elements drop. Routed through the native one-hash-set-pass
    * expression ([[SketchExpressions.firstOccurrences]], O(n) expected
    * per document) — the built-in form below is O(n²) comparisons per
    * row and exists as the parity reference (pinned in FunctionsSpec).
    */
  def firstOccurrencesOf(ls: Column): Column =
    SketchExpressions.firstOccurrences(ls)

  /** The built-in formulation of [[firstOccurrencesOf]] — the parity
    * reference. Pass a STAGED column, not an expression — the lambda
    * references the array once per element, so an inlined tree would
    * re-evaluate per element (the staged-projection discipline).
    */
  def firstOccurrencesOfBuiltin(ls: Column): Column =
    filter(ls, (x, i) => array_position(ls, x) === i.cast("long") + lit(1L))

  /** Fraction of tokens that are repeats of an earlier token. */
  def dupTokenFraction(c: Column): Column = dupTokenFractionOf(tokens(c))

  def dupTokenFractionOf(ts: Column): Column =
    ratio(size(ts) - size(array_distinct(ts)), size(ts))

  /** Fraction of the document's tokens covered by its single most frequent
    * word n-gram: max_gram_count * n / token_count — O(g log g) per
    * document (sort grams, scan runs of equal adjacent grams), one stage,
    * no shuffle. The relational alternative (explode → count → max) would
    * shuffle the whole corpus's grams; a naive per-row distinct×scan fold
    * is O(g²) and stalls an executor on one long boilerplate document.
    * Null when the document has fewer than n tokens. Routed through the
    * native run-scan expression ([[SketchExpressions.topNgramFraction]] —
    * the built-in `array_sort` + `aggregate` fold below is the parity
    * reference, pinned equal in PropertySpec/SketchParitySpec).
    */
  def topNgramFraction(c: Column, n: Int): Column = topNgramFractionOf(tokens(c), n)

  def topNgramFractionOf(ts: Column, n: Int): Column =
    SketchExpressions.topNgramFraction(ts, n)

  def topNgramFractionOfBuiltin(ts: Column, n: Int): Column = {
    val gs = array_sort(SketchExpressions.wordShingles(ts, n))
    val best = aggregate(
      gs,
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val maxCount = when(size(gs) === 0, lit(null)).otherwise(best)
    ratio(maxCount * lit(n), size(ts).cast("long"))
  }

  /** Fraction of the document's n-grams that are duplicates — i.e. the
    * grams sitting in runs of length > 1 after sorting, over total grams
    * (Gopher's duplicate-n-gram family, n = 5..10, measured in grams
    * rather than the paper's characters). Same sorted-run machinery as
    * [[topNgramFractionOf]]: O(g log g) per row, no shuffle, native
    * run-scan expression with the built-in fold kept as the pinned parity
    * reference. Null when the document has fewer than n tokens.
    */
  def dupNgramFraction(c: Column, n: Int): Column = dupNgramFractionOf(tokens(c), n)

  def dupNgramFractionOf(ts: Column, n: Int): Column =
    SketchExpressions.dupNgramFraction(ts, n)

  def dupNgramFractionOfBuiltin(ts: Column, n: Int): Column = {
    val gs = array_sort(SketchExpressions.wordShingles(ts, n))
    val closeRun = (run: Column, dup: Column) =>
      dup + when(run > 1, run).otherwise(lit(0))
    val dupTotal = aggregate(
      gs,
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("dup")),
      (acc, g) => {
        val cont = g === acc.getField("prev")
        val run = when(cont, acc.getField("run") + 1).otherwise(lit(1))
        val dup = when(cont, acc.getField("dup"))
          .otherwise(closeRun(acc.getField("run"), acc.getField("dup")))
        struct(g.as("prev"), run.as("run"), dup.as("dup"))
      },
      acc => closeRun(acc.getField("run"), acc.getField("dup")))
    ratio(when(size(gs) === 0, lit(null)).otherwise(dupTotal), size(gs))
  }

  /** Fraction of lines starting with a bullet marker. */
  def bulletLineFraction(c: Column): Column = bulletLineFractionOf(docLines(c))

  def bulletLineFractionOf(ls: Column): Column =
    ratio(SketchExpressions.countMatching(ls, "^\\s*[-*•‣▪] "), size(ls))

  /** Fraction of lines ending in an ellipsis. */
  def ellipsisLineFraction(c: Column): Column = ellipsisLineFractionOf(docLines(c))

  def ellipsisLineFractionOf(ls: Column): Column =
    ratio(SketchExpressions.countMatching(ls, "(\\.\\.\\.|…)$"), size(ls))

  /** `#` or ellipsis occurrences per token (Gopher's symbol-to-word ratio). */
  def symbolToWordRatio(c: Column): Column = symbolToWordRatioOf(c, tokens(c))

  def symbolToWordRatioOf(c: Column, ts: Column): Column =
    ratio(size(regexp_extract_all(c, lit("#|\\.\\.\\."), lit(0))).cast("long"),
      size(ts).cast("long"))

  /** Fraction of tokens containing at least one alphabetic character
    * (Gopher requires ≥ 80% such words).
    */
  def alphaWordFraction(c: Column): Column = alphaWordFractionOf(tokens(c))

  def alphaWordFractionOf(ts: Column): Column =
    ratio(SketchExpressions.countMatching(ts, "[A-Za-z]"), size(ts))

  /** Mean non-whitespace chars per token, from precomputed tokens. */
  def avgTokenLenOf(c: Column, ts: Column): Column =
    ratio(size(regexp_extract_all(c, lit("\\S"), lit(0))).cast("long"),
      size(ts).cast("long"))

  /** Gopher-style keep/drop decision — a SUBSET of the §A1.1 rules with
    * verbatim thresholds: 50 ≤ tokens ≤ 100k, mean token length in [3,10],
    * symbol ratio ≤ 0.1, < 90% bullet lines, ≤ 30% ellipsis lines,
    * ≥ 80% of words contain an alphabetic character, ≤ 30% duplicate
    * lines, top 2-/3-/4-gram ≤ 20%/18%/16% of tokens, ≥ 2 stopword hits.
    * Stopwords are Gopher's own 8-word set ([[GopherStopwords]]).
    * Documented divergences from the paper: the top-n-gram and
    * duplicate-n-gram fractions are measured in TOKENS/GRAMS rather than
    * characters, and the duplicate-n-gram family (n = 5..10,
    * [[dupNgramFraction]], thresholds 0.15..0.10 — see the q58 gate
    * query) is kept out of this conjunction so the common path pays for
    * three gram sorts, not nine.
    * A false/short document short-circuits to false (never null): the
    * token-count clause fails first and AND(false, null) = false in both
    * Spark and DuckDB, so the ratio nulls of a degenerate doc can't leak.
    *
    * This convenience form re-derives the token/line arrays per clause —
    * fine for fixtures; a corpus-scale projection should compute the
    * arrays and signal columns once and combine them with
    * [[gopherKeepFromSignals]] (as the q52 gate query does).
    */
  def gopherKeep(c: Column): Column = {
    val ts = tokens(c)
    val ls = docLines(c)
    gopherKeepFromSignals(
      nTokens = tokenCount(c),
      avgTokLen = avgTokenLenOf(c, ts),
      symbolRatio = symbolToWordRatioOf(c, ts),
      bulletFrac = bulletLineFractionOf(ls),
      ellipsisFrac = ellipsisLineFractionOf(ls),
      alphaFrac = alphaWordFractionOf(ts),
      dupLineFrac = dupLineFractionOf(ls),
      top2 = topNgramFractionOf(ts, 2),
      top3 = topNgramFractionOf(ts, 3),
      top4 = topNgramFractionOf(ts, 4),
      nStopwords = stopwordCount(c, GopherStopwords))
  }

  /** [[gopherKeep]] over ALREADY-COMPUTED signal columns — each signal is
    * evaluated once in the projection that binds it, and the keep rule is
    * a cheap boolean conjunction over those columns.
    */
  def gopherKeepFromSignals(nTokens: Column, avgTokLen: Column,
      symbolRatio: Column, bulletFrac: Column, ellipsisFrac: Column,
      alphaFrac: Column, dupLineFrac: Column, top2: Column, top3: Column,
      top4: Column, nStopwords: Column): Column =
    nTokens.between(50, 100000) &&
      avgTokLen.between(3.0, 10.0) &&
      symbolRatio <= 0.1 &&
      bulletFrac < 0.9 &&
      ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 &&
      dupLineFrac <= 0.3 &&
      top2 <= 0.20 &&
      top3 <= 0.18 &&
      top4 <= 0.16 &&
      nStopwords >= 2

  // ---- C4 cleaning (Raffel et al. §2.2) — the line- and page-level
  // rules C4 applies before dedup. Span-level (three-sentence) dedup is
  // intentionally NOT here: the MinHash/SimHash family covers near-dup
  // removal; these are the cheap per-row filters that run first. ----

  /** C4's line keep rule: ends in terminal punctuation (. ! ? or a
    * closing quote after one), has ≥ 5 words, and does not mention
    * "javascript" (case-insensitive).
    */
  def c4LineKeep(l: Column): Column =
    l.rlike("[.!?][\"')\\]]?\\s*$") &&
      size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= 5 &&
      !lower(l).contains("javascript")

  /** The kept lines of a document under [[c4LineKeep]]. */
  def c4CleanLines(c: Column): Column = filter(docLines(c), c4LineKeep _)

  /** The document rebuilt from its kept lines (C4's cleaned page text). */
  def c4CleanText(c: Column): Column = array_join(c4CleanLines(c), "\n")

  /** Terminal-punctuation count — C4's sentence-count proxy. */
  def sentenceCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.!?]"), lit(0))).cast("long")

  /** C4's page keep rule: ≥ 3 sentences, no "lorem ipsum", no curly
    * brace (code), applied to the CLEANED text. The published bad-words
    * list is out of scope (policy data, not an operator).
    */
  def c4PageKeep(cleaned: Column): Column =
    sentenceCount(cleaned) >= 3 &&
      !lower(cleaned).contains("lorem ipsum") &&
      !cleaned.contains("{")

  /** MinHash signature: k independent permutations simulated by re-hashing
    * each shingle's base hash with the permutation index — xxhash64 over
    * (long, int), never per-permutation string building, so the hot path is
    * k·|shingles| cheap long hashes. Empty shingle sets get a null signature.
    */
  def minhashSignature(shinglesCol: Column, k: Int): Column = {
    val baseHashes = transform(shinglesCol, s => xxhash64(s))
    when(size(shinglesCol) === 0, lit(null)).otherwise(
      transform(
        sequence(lit(0), lit(k - 1)),
        i => array_min(transform(baseHashes, h => xxhash64(h, i)))
      )
    )
  }

  /** LSH band keys: hash of each row of the banded signature. Equal band key
    * ⇒ candidate pair. `b` bands of `r` rows must satisfy b*r == k.
    */
  def lshBands(signature: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",", slice(signature, b * lit(rows) + lit(1), lit(rows)).cast("array<string>")), b)
    )

  /** 64-bit SimHash from token xxhash64s: bit i of the result is the sign of
    * sum over tokens of (bit i set ? +1 : -1). Expressed as a fold over 64
    * bit positions using aggregate() — built-ins only.
    */
  def simhash64(tokensCol: Column): Column = {
    val hashes = transform(tokensCol, t => xxhash64(t))
    // for each bit: count of set bits*2 - n  > 0  => bit set
    val n = size(tokensCol)
    val bitCols = (0 until 64).map { i =>
      val setCount = aggregate(
        hashes, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L))
      )
      when(setCount * 2 > n.cast("long"), shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("int")

  /** Rolling hash fingerprint of the whole document's tokens — a cheap
    * order-sensitive document fingerprint. Shift/xor mixing only, so it
    * cannot overflow under ANSI mode.
    */
  def docFingerprint(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) =>
      shiftleft(acc, 5).bitwiseXOR(shiftright(acc, 59)).bitwiseXOR(xxhash64(t)))

  /** PII scrubbing for training corpora: emails, international-ish phone
    * numbers, and IPv4 addresses replaced with stable placeholder tags.
    * Pure codegen'd regexp_replace chain — one scan, no shuffle; patterns
    * are deliberately conservative (over-matching mangles legitimate text,
    * which is worse at corpus scale than a missed rare form).
    *
    * The phone pattern therefore demands BOTH ≥9 digits AND a marker no
    * date or bare numeric ID carries: a leading `+`/`(`, a space after
    * the 3-4 digit area/prefix group, or a fully hyphenated 3+ groups of
    * 3+ digits shape. `2026-08-12` (date groups are 2 digits) and
    * `12345678901` (no separators) survive; `+44 20 7946 0958`,
    * `(020) 7946 0958`, `020 7946 0958`, `020-7946-0958` are redacted.
    * Kept lookaround-free so the identical pattern runs under both Java
    * regex and DuckDB's RE2 (the q48 oracle interpolates these constants
    * verbatim).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe =
    "[+(][0-9](?:[ ()-]*[0-9]){8,14}" +
      "|[0-9]{3,4} (?:[0-9][ ()-]*){5,13}[0-9]" +
      "|[0-9]{3,4}-[0-9]{3,4}-[0-9]{3,4}(?:-[0-9]{2,4})?"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
