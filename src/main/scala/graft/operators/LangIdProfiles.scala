package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable character-n-gram language identification by rank-order
  * profiles (Cavnar & Trenkle 1994, the "out-of-place" measure) — the
  * TRAINED counterpart of the stopword-marker heuristic
  * ([[graft.functions.TextFunctions.langId]], q21): build each
  * language's top-K character-trigram rank profile from labeled
  * documents, then classify by summed rank displacement. Everything is
  * exact integer arithmetic with total-order ties (count desc, gram
  * asc; distance ties to the lexicographically first language), so
  * training and classification replay bit-identically on any engine.
  *
  * Scale shape: profile building is one map-side-combined (lang, gram)
  * count plus a per-language rank window over at most |langs| × |grams|
  * distinct rows (model-sized); per-document ranks window over each
  * document's own grams (partition key = doc — full parallelism);
  * classification joins the document top-M grams against the broadcast
  * model and folds |rank − rank| with an out-of-place penalty of K for
  * grams missing from a profile. No stage holds more than
  * (docs × M × |langs|) thin rows.
  */
object LangIdProfiles {

  /** Character trigrams of `textCol`, one row per occurrence. */
  private def grams(df: DataFrame, idCols: Seq[Column], textCol: String): DataFrame =
    df.select(idCols :+ col(textCol).as("__s"): _*)
      .filter(length(col("__s")) >= 3)
      .select(idCols :+ explode(transform(
        sequence(lit(1), length(col("__s")) - 2),
        i => col("__s").substr(i, lit(3)))).as("gram"): _*)

  /** The trained model: (lang, gram, rank), rank 1..K by (count desc,
    * gram asc) within each language.
    */
  def trainProfiles(docs: DataFrame, langCol: String, textCol: String,
                    topK: Int = 50): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("gram"))
    grams(docs, Seq(col(langCol).as("lang")), textCol)
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("lang"), col("gram"), col("rank"))
  }

  /** Classify every document against `profiles` (a [[trainProfiles]]
    * frame): (idCol, pred_lang, distance) — distance = Σ over the
    * document's top-M grams of |doc rank − profile rank|, with
    * `penalty` for grams absent from the language's profile; the
    * winning language is the minimum (distance, lang). Documents
    * shorter than 3 chars never appear.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               profiles: DataFrame, topM: Int = 20,
               penalty: Long = 50L): DataFrame = {
    require(topM >= 1, s"topM must be >= 1, got $topM")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("c").desc, col("gram"))
    val docProf = grams(docs, Seq(col(idCol).as("doc_id")), textCol)
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .withColumn("drank", row_number().over(w).cast("long"))
      .filter(col("drank") <= topM)
      .select(col("doc_id"), col("gram"), col("drank"))
    val langs = profiles.select(col("lang")).distinct()
    docProf.join(langs)
      .join(broadcast(profiles), Seq("lang", "gram"), "left")
      .withColumn("d", coalesce(abs(col("drank") - col("rank")), lit(penalty)))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("d")).as("dist"))
      .groupBy(col("doc_id"))
      .agg(min(struct(col("dist").as("d"), col("lang").as("l"))).as("w"))
      .select(col("doc_id").as(idCol), col("w.l").as("pred_lang"),
        col("w.d").as("distance"))
  }
}
