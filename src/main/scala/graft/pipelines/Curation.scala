package graft.pipelines

import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the flagship shape every
  * training-data run executes, chained as ONE declarative plan so
  * Catalyst sees (and the per-stage operators share) the whole
  * lineage: exact dedup on normalized text → quality gate → salted
  * per-source cap → per-source accounting. Each stage is an operator
  * family the suite gates in isolation (q16 dedup, q52 quality
  * signals, q97 cap); this pipeline is their composition with
  * per-stage DROP ACCOUNTING, the report a curation run actually
  * ships.
  *
  * Determinism: dedup keeps the LOWEST doc_id of each normalized
  * group (a window min, no arbitrary first()); the quality gate
  * compares INTEGERS (letters·10 >= chars·7 instead of a float ratio);
  * the cap ranks by the portable 60-bit hash of the doc id (ties to
  * the id) — the q97 salted draw, reproducible in any engine.
  *
  * Scale shape: one window over the normalized-text hash partition
  * (the dedup), one over source (the cap) — both natural shuffle keys;
  * the summary is a map-side-combined conditional aggregate joined
  * once on source. No collect, no cartesian, no float order anywhere.
  */
object Curation {

  /** Per-source curation report:
    * (source, n_docs, n_dup, n_lowq, n_kept, n_cap_dropped, tokens_kept).
    */
  def summary(docs: DataFrame, idCol: String, textCol: String,
              sourceCol: String, minTokens: Int = 20,
              capPerSource: Int = 20): DataFrame = {
    val wDedup = Window.partitionBy(lower(trim(col(textCol))))
    val base = docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        col(textCol).as("text"))
      .withColumn("toks", size(TextFunctions.tokens(col("text"))).cast("long"))
      .withColumn("letters",
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long"))
      .withColumn("is_dup", col("doc_id") =!= min(col("doc_id")).over(wDedup))
      .withColumn("q_ok", col("toks") >= minTokens &&
        col("letters") * 10 >= length(col("text")).cast("long") * 7)

    val wCap = Window.partitionBy(col("source"))
      .orderBy(PortableHash.hash60(col("doc_id").cast("string")), col("doc_id"))
    val kept = base.filter(!col("is_dup") && col("q_ok"))
      .withColumn("rk", row_number().over(wCap))

    val stageCounts = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
      sum(when(!col("is_dup") && !col("q_ok"), 1L).otherwise(0L)).as("n_lowq"))
    val keptCounts = kept.groupBy(col("source")).agg(
      sum(when(col("rk") <= capPerSource, 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("rk") > capPerSource, 1L).otherwise(0L)).as("n_cap_dropped"),
      sum(when(col("rk") <= capPerSource, col("toks")).otherwise(0L))
        .as("tokens_kept"))

    stageCounts.join(keptCounts, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_dup"), col("n_lowq"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_cap_dropped"), lit(0L)).as("n_cap_dropped"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
  }
}
