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
}
