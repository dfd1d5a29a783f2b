package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted index (token → posting list) — the lookup artifact behind
  * corpus attribution, contamination tracing, and "which documents contain
  * this string" queries at training-data scale.
  *
  * Per token: `df` (number of documents containing it) and `postings` (the
  * first `maxPostings` doc ids in ascending order). The cap is what makes
  * the build scale-safe: a stop-word's full posting list is the corpus
  * itself, so an uncapped `collect_list` would hand one aggregation buffer
  * the whole dataset. Here `df` comes from a plain count (map-side
  * combined, constant-size state), and only rows surviving a per-token
  * `row_number ≤ maxPostings` window reach the list aggregation. Catalyst
  * compiles that filtered window to a PARTIAL `WindowGroupLimit` below the
  * exchange (pinned in InvertedIndexSpec): every map task pre-trims to the
  * top `maxPostings` doc ids per token, so even a stop-word ships at most
  * `maxPostings × tasks` rows through the shuffle — the collect_list
  * buffer is bounded by construction.
  */
object InvertedIndex {

  def postings(docs: DataFrame, idCol: String, textCol: String,
               maxPostings: Int): DataFrame = {
    require(maxPostings > 0, "maxPostings must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("token"))
    val dfCounts = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
    val capped = toks.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPostings)
      .groupBy(col("token"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
    dfCounts.join(capped, Seq("token"))
  }
}
