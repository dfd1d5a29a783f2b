package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over grouped, time-ordered logs: the
  * first-order Markov transition matrix (where do users go NEXT) and
  * top leading paths (how do journeys START) — the standard
  * product-analytics pair next to [[Funnel]]'s conversion counts.
  * Both are windows + counts over exact values: the only float is the
  * transition probability, ONE correctly-rounded division of exact
  * integers, so everything replays bit-for-bit.
  *
  * Scale shape: one shuffle on the key for the window pass, then
  * map-side-combined counts over (src, dst) / path keys whose
  * cardinality is type-vocabulary-bounded, not corpus-bounded.
  */
object Sequences {

  /** First-order transition matrix: (src_type, dst_type, n, p) where p
    * is the row-conditional probability n / Σ_dst n.
    */
  def transitionMatrix(ev: DataFrame, keyCol: String, typeCol: String,
                       orderCol: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCol, tieCol)
    val g = ev
      .select(col(typeCol).as("src_type"),
        lead(col(typeCol), 1).over(w).as("dst_type"))
      .filter(col("dst_type").isNotNull)
      .groupBy(col("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n"))
    g.withColumn("p", col("n").cast("double") /
      sum(col("n")).over(Window.partitionBy(col("src_type"))))
  }

  /** Windowed (skip-gram) co-occurrence counts: how often type B
    * follows type A within the next `window` events of the same key —
    * the item2vec/word2vec training-pair statistic lifted to event
    * logs, and the generalization of [[transitionMatrix]] (which is
    * exactly window = 1). Counts are position-ordered (A strictly
    * before B), so the matrix is directed.
    *
    * Scale shape: one shuffle on the key for the rank window, then a
    * key-co-located range self-join whose pair space is n·window —
    * LINEAR in the log (never per-key quadratic), with the count
    * map-side combined over the type-vocabulary-bounded (src, dst)
    * keys.
    *
    * @return (src_type, dst_type, gap 1..window, n_pairs) — gap kept
    *         so callers can apply their own distance weighting without
    *         this operator committing to a float scheme
    */
  def skipGramPairs(ev: DataFrame, keyCol: String, typeCol: String,
                    orderCol: Column, tieCol: Column,
                    window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCol, tieCol)
    val r = ev.withColumn("__rn", row_number().over(w))
      .select(col(keyCol).as("__k"), col(typeCol).as("__t"), col("__rn"))
    val a = r.select(col("__k"), col("__t").as("src_type"),
      col("__rn").as("__ra"))
    val b = r.select(col("__k"), col("__t").as("dst_type"),
      col("__rn").as("__rb"))
    a.join(b, Seq("__k"))
      .filter(col("__rb") > col("__ra") &&
        col("__rb") <= col("__ra") + window)
      .select(col("src_type"), col("dst_type"),
        (col("__rb") - col("__ra")).cast("long").as("gap"))
      .groupBy(col("src_type"), col("dst_type"), col("gap"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** The `topK` most common journey openings: each key's first `maxLen`
    * event types in order, joined with `sep`, counted across keys.
    */
  def topPaths(ev: DataFrame, keyCol: String, typeCol: String,
               orderCol: Column, tieCol: Column, maxLen: Int, topK: Int,
               sep: String = ">"): DataFrame = {
    require(maxLen >= 1 && topK >= 1, "maxLen and topK must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCol, tieCol)
    ev.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxLen)
      .groupBy(col(keyCol))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__rn"), col(typeCol).as("t")))),
        x => x.getField("t")), sep).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topK)
  }
}
