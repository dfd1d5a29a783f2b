package graft.operators

import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Substring-level duplication statistics (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): instead
  * of doc-level near-dup (MinHash, q22), measure which SPANS of each
  * document also occur elsewhere in the corpus — the signal used to cut
  * duplicated substrings out of training data and to down-weight
  * boilerplate-heavy documents.
  *
  * A span is a k-token gram; a gram is "duplicated" when its corpus-wide
  * occurrence count (including repeats inside one document) reaches
  * `minCount`. Per document this reports the duplicated-gram count, the
  * number of TOKENS covered by at least one duplicated gram (interval
  * union of the k-wide windows, folded over the sorted start positions:
  * k for the first + min(k, gap) per successive start), and the covered
  * fraction.
  *
  * Scale shape: grams shuffle as 60-bit portable hashes (md5-derived,
  * [[PortableHash.hash60]]) — the exchange carries longs, never k-token
  * strings; the corpus-wide count is one map-side-combined groupBy on
  * the hash; the per-doc interval union is array work after a groupBy
  * on doc id (state bounded by the doc's own gram count). Everything is
  * integer except the final covered fraction — ONE correctly-rounded
  * IEEE division — so a DuckDB oracle replays all of it exactly.
  */
object SubstringDedup {

  private val Sep = "\u001f"

  /** Per-document duplicated-span statistics.
    *
    * @return (idCol, `n_tokens`, `n_dup_grams`, `dup_tokens`,
    *         `dup_frac`) — one row per input document, zeros for
    *         documents shorter than k tokens or with no duplicated gram
    */
  def dupSpanStats(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, minCount: Long = 2L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = docs.select(col(idCol),
        TextFunctions.tokens(col(textCol)).as("__ts"))
      .withColumn("n_tokens", size(col("__ts")).cast("long"))

    val grams = toks
      .filter(col("n_tokens") >= k)
      .select(col(idCol), explode(transform(
        sequence(lit(1L), col("n_tokens") - (k - 1)),
        i => struct(i.as("start"),
          PortableHash.hash60(
            array_join(slice(col("__ts"), i.cast("int"), lit(k)), Sep))
            .as("gh")))).as("g"))
      .select(col(idCol), col("g.start").as("start"), col("g.gh").as("gh"))

    val dupGrams = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .select(col("gh"))

    val perDoc = grams.join(dupGrams, "gh")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("start"))).as("starts"),
        count(lit(1)).as("n_dup_grams"))
      .withColumn("dup_tokens",
        lit(k.toLong) + coalesce(aggregate(
          zip_with(
            slice(col("starts"), lit(1), size(col("starts")) - 1),
            slice(col("starts"), lit(2), size(col("starts")) - 1),
            (a, b) => least(lit(k.toLong), b - a)),
          lit(0L), (acc, v) => acc + v), lit(0L)))
      .select(col(idCol), col("n_dup_grams"), col("dup_tokens"))

    toks.select(col(idCol), col("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(coalesce(col("dup_tokens"), lit(0L)).cast("double")
            / col("n_tokens").cast("double")).as("dup_frac"))
  }

  /** The REMOVAL counterpart of [[dupSpanStats]] — Lee et al. 2022's
    * ExactSubstr cut applied at gram granularity: every token covered by
    * at least one corpus-duplicated k-gram is dropped, and the document
    * is re-rendered from its kept tokens (single-space joined — the
    * token array is the unit of this operator, so original whitespace is
    * deliberately not preserved; short-of-k documents keep all tokens).
    * Deterministic with no cross-document coordination: coverage depends
    * only on corpus-wide gram counts.
    *
    * Scale shape: identical to [[dupSpanStats]] up to the per-doc sorted
    * start list; the cut itself is a native two-pointer merge over
    * (tokens, starts) — O(tokens + starts) per document, not the
    * O(tokens · starts) an exists-per-token formulation costs (that form
    * remains as the spec parity reference).
    *
    * @return (idCol, `n_tokens`, `n_kept`, `clean_text`) — one row per
    *         input document; `n_tokens` − `n_kept` equals
    *         [[dupSpanStats]]'s `dup_tokens` (spec-pinned)
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minCount: Long = 2L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = docs.select(col(idCol),
        TextFunctions.tokens(col(textCol)).as("__ts"))
      .withColumn("n_tokens", size(col("__ts")).cast("long"))

    val grams = toks
      .filter(col("n_tokens") >= k)
      .select(col(idCol), explode(transform(
        sequence(lit(1L), col("n_tokens") - (k - 1)),
        i => struct(i.as("start"),
          PortableHash.hash60(
            array_join(slice(col("__ts"), i.cast("int"), lit(k)), Sep))
            .as("gh")))).as("g"))
      .select(col(idCol), col("g.start").as("start"), col("g.gh").as("gh"))

    val dupGrams = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .select(col("gh"))

    val dupStarts = grams.join(dupGrams, "gh")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("start"))).as("__starts"))

    toks.join(dupStarts, Seq(idCol), "left")
      .withColumn("__kept", uncoveredTokens(col("__ts"),
        coalesce(col("__starts"), array().cast("array<bigint>")), k))
      .select(col(idCol), col("n_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), " ").as("clean_text"))
  }

  /** Cross-source contamination matrix: for every pair of corpus sources,
    * the number of DISTINCT k-gram hashes occurring in both — the
    * diagnostic behind mixing and decontamination decisions (how much of
    * source A's text already leaks into source B).
    *
    * Scale shape: grams reduce to distinct (source, gh) pairs (one
    * map-side-combined shuffle on the hash), each gram's source set is
    * gathered ONCE (same gh partitioning — no second exchange), and the
    * upper-triangle pair expansion is per-gram array work bounded by
    * `maxSourcesPerGram`² — a gram in more sources than the cap is
    * excluded as universal boilerplate (it would dominate every cell
    * AND blow the pair space at web scale, where `source` is a domain
    * with ~1M values). The final matrix aggregate carries
    * O(sources²) rows at most.
    *
    * @return (`source_a`, `source_b`, `shared_grams`) with
    *         source_a < source_b — only pairs sharing ≥ 1 gram appear
    */
  def crossSourceOverlap(docs: DataFrame, textCol: String, sourceCol: String,
                         k: Int = 8, maxSourcesPerGram: Int = 64): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxSourcesPerGram >= 2, "maxSourcesPerGram must be >= 2")
    val grams = docs
      .select(col(sourceCol).as("__src"),
        TextFunctions.tokens(col(textCol)).as("__ts"))
      .withColumn("__n", size(col("__ts")).cast("long"))
      .filter(col("__n") >= k)
      .select(col("__src"), explode(transform(
        sequence(lit(1L), col("__n") - (k - 1)),
        i => PortableHash.hash60(
          array_join(slice(col("__ts"), i.cast("int"), lit(k)), Sep))))
        .as("gh"))
      .distinct()
    val bySources = grams.groupBy(col("gh"))
      .agg(sort_array(collect_set(col("__src"))).as("__ss"))
      .filter(size(col("__ss")).between(2, maxSourcesPerGram))
    bySources
      .select(explode(flatten(transform(col("__ss"), (a, i) =>
        transform(slice(col("__ss"), i + 2, size(col("__ss"))),
          b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** Column API: tokens NOT covered by any k-wide window starting at one
    * of `starts` (1-based, sorted ascending) — native two-pointer merge.
    * Parity reference: [[uncoveredTokensBuiltin]] (pinned in
    * SubstringDedupSpec).
    */
  def uncoveredTokens(tokens: org.apache.spark.sql.Column,
                      starts: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(UncoveredTokensExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(tokens),
      org.apache.spark.sql.GraftColumnBridge.expression(starts), k))

  /** The exists-per-token built-in formulation — O(tokens · starts), spec
    * parity reference only.
    */
  def uncoveredTokensBuiltin(tokens: org.apache.spark.sql.Column,
                             starts: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    filter(tokens, (_, i) =>
      size(filter(starts, s =>
        s <= i.cast("long") + 1L && i.cast("long") + 1L < s + lit(k.toLong))) === 0)
}

/** Two-pointer cover filter: token i (1-based) is dropped iff some start
  * s (sorted ascending, intervals [s, s+k)) covers it. All intervals
  * share length k, so sorted starts ⇒ monotone interval ends and one
  * forward pointer suffices: O(tokens + starts) per document. Null
  * tokens/starts arrays yield null.
  */
case class UncoveredTokensExpr(
    tokens: org.apache.spark.sql.catalyst.expressions.Expression,
    starts: org.apache.spark.sql.catalyst.expressions.Expression,
    k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: org.apache.spark.sql.catalyst.expressions.Expression = tokens
  override def right: org.apache.spark.sql.catalyst.expressions.Expression = starts
  override def dataType: org.apache.spark.sql.types.DataType = tokens.dataType
  override def nullable: Boolean = true

  // SQL-reachable (graft_uncovered_tokens): an int-literal starts array —
  // the natural SQL spelling `array(2)` — must fail at analysis, not read
  // 4-byte slots as longs inside an executor
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types._
    (tokens.dataType, starts.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, s) => TypeCheckResult.TypeCheckFailure(
        "graft_uncovered_tokens expects (array<string>, array<bigint>), got " +
          s"(${t.simpleString}, ${s.simpleString})")
    }
  }

  override def nullSafeEval(t: Any, s: Any): Any = {
    val toks = t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sts = s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = toks.numElements()
    val m = sts.numElements()
    val out = new java.util.ArrayList[Any](n)
    var p = 0
    var i = 1L // 1-based token index, matching the gram starts
    while (i <= n) {
      // Null ELEMENTS must match the builtin parity form exactly: a null
      // start contributes a null predicate to the builtin's inner filter
      // (excluded — covers nothing), and sort_array places nulls FIRST, so
      // skipping them here preserves the two-pointer monotonicity; a null
      // token passes the builtin's outer filter untouched (its lambda never
      // reads the value), so it stays in the output AS null rather than
      // being read out of an UnsafeArrayData null slot as garbage.
      while (p < m && (sts.isNullAt(p) || sts.getLong(p) + k <= i)) p += 1
      val covered = p < m && sts.getLong(p) <= i
      if (!covered) {
        out.add(if (toks.isNullAt((i - 1).toInt)) null
                else toks.getUTF8String((i - 1).toInt))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): UncoveredTokensExpr =
    copy(tokens = newLeft, starts = newRight)
}
