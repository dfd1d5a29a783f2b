package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFunctions}

/** Benchmark decontamination: find training documents that share word
  * k-grams with an evaluation/benchmark set, the published guard against
  * test-set leakage in LLM training corpora (an n-gram-overlap variant of
  * the checks described in the GPT-3/PaLM appendices).
  *
  * Scale shape: the benchmark side is an eval suite — thousands of
  * documents, at most a few million distinct k-grams — while the training
  * side is the 100 TB corpus. Both sides reduce to DISTINCT per-document
  * grams map-side (`array_distinct` before the explode), the benchmark
  * collapses to a distinct gram-key set, and the corpus's grams join it
  * with an explicit `broadcast()`: the corpus never shuffles, never sorts,
  * and the whole check is one scan plus a map-side hash probe. Gram keys
  * are 60-bit portable hashes rather than strings, shrinking the broadcast
  * ~10x; a collision can only add a false positive — conservative in the
  * right direction for decontamination (`hashGrams = false` joins raw
  * strings when exactness matters).
  */
object Decontaminate {

  /** One row per contaminated training document: (idCol, n_shared_grams),
    * where n_shared_grams counts the DISTINCT k-grams of the document that
    * also appear anywhere in the benchmark.
    */
  def overlaps(train: DataFrame, bench: DataFrame, idCol: String,
               textCol: String, k: Int, hashGrams: Boolean = true): DataFrame = {
    val benchKeys = docGramKeysOf(bench, textCol, k, hashGrams, Nil).distinct()
    docGramKeysOf(train, textCol, k, hashGrams, Seq(idCol))
      .join(broadcast(benchKeys), "_gram_key")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The per-document gram-key frame shared by [[overlaps]] and the store
    * path ([[appendGramStore]]/[[overlapsFromStore]]): (keep...,
    * _gram_key). ONE derivation on purpose — the documented bit-identity
    * between overlaps and overlapsFromStore holds because both sides call
    * this, not because two copies happen to agree. Keys are deduped PER
    * ROW (array_distinct over the hashed array, not a corpus-wide
    * DISTINCT): grams are already unique within a document, so only a
    * within-document hash collision could duplicate a key, and collapsing
    * that costs nothing extra map-side.
    */
  private def docGramKeysOf(df: DataFrame, textCol: String, k: Int,
                            hashGrams: Boolean, keep: Seq[String]): DataFrame = {
    def gramKey(gram: org.apache.spark.sql.Column) =
      if (hashGrams) PortableHash.hash60(gram) else gram.cast("string")
    df.select(keep.map(col) :+
      explode(array_distinct(transform(
        array_distinct(TextFunctions.wordShingles(col(textCol), k)),
        g => gramKey(g)))).as("_gram_key"): _*)
  }

  /** Append a benchmark batch's distinct gram-hash keys to the persisted
    * REFERENCE store — the benchmark side of decontamination as a
    * maintained table: eval suites grow by addition (a new benchmark
    * lands, its grams append; nothing rewrites), and the probe side
    * reads whatever has accumulated. Batch-distinct only — cross-batch
    * duplicates (and crash-window replays) collapse at read time, so
    * appends are idempotent in effect.
    */
  def appendToGramStore(bench: DataFrame, textCol: String, k: Int,
                        table: String, buckets: Int): Unit =
    docGramKeysOf(bench, textCol, k, hashGrams = true, Nil).distinct()
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "_gram_key").sortBy("_gram_key")
      .saveAsTable(table)

  /** [[overlaps]] served from a persisted gram store: the store's
    * distinct key set (the dedup is exchange-free on the store's
    * _gram_key bucketing) broadcasts into the same map-side probe —
    * the corpus never shuffles, and the answer is bit-identical to the
    * one-shot [[overlaps]] over everything ever appended.
    */
  def overlapsFromStore(spark: org.apache.spark.sql.SparkSession,
                        table: String, train: DataFrame, idCol: String,
                        textCol: String, k: Int): DataFrame = {
    val keys = spark.table(table).distinct()
    docGramKeysOf(train, textCol, k, hashGrams = true, Seq(idCol))
      .join(broadcast(keys), "_gram_key")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The clean corpus: training documents with NO k-gram overlap.
    * Contaminated ids come from the same broadcast probe; the final
    * anti-join's right side is only the contaminated-id list (a small
    * fraction of the corpus when the benchmark is an eval suite), which
    * AQE broadcasts — the corpus itself still never shuffles.
    */
  def clean(train: DataFrame, bench: DataFrame, idCol: String,
            textCol: String, k: Int, hashGrams: Boolean = true): DataFrame = {
    val bad = overlaps(train, bench, idCol, textCol, k, hashGrams)
      .select(col(idCol))
    train.join(bad, Seq(idCol), "left_anti")
  }
}
