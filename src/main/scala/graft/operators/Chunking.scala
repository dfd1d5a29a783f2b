package graft.operators

import graft.functions.{IntOps, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window document chunking — the context-length stage of a training
  * pipeline: every document is cut into windows of at most `maxTokens`
  * tokens whose starts advance by `stride` (stride < maxTokens ⇒
  * overlapping windows, the usual setting for long-document training and
  * retrieval indexing).
  *
  * Chunk i covers tokens [i·stride, i·stride + maxTokens); the last chunk
  * starts at the smallest multiple of `stride` from which the window
  * reaches the end of the document, so every token appears in ≥ 1 chunk
  * and a document of ≤ maxTokens tokens yields exactly one chunk.
  *
  * Scale shape: pure per-row tokenize → `explode` over a computed chunk
  * count — no shuffle, no state, linear in corpus size; the chunk count
  * arithmetic is exact integer math ([[graft.functions.IntOps.intDiv]]),
  * never a double round-trip. Output grows by roughly maxTokens/stride ×
  * the input token volume, which is the caller's knob, not a plan hazard.
  */
object Chunking {

  /** One output row per (document, chunk): `chunk_id` (0-based long),
    * `chunk_text` (tokens re-joined with single spaces), `n_chunk_tokens`.
    * Token-less documents produce no rows. All other input columns pass
    * through unchanged.
    */
  def chunkByTokens(df: DataFrame, textCol: String,
                    maxTokens: Int, stride: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(stride > 0 && stride <= maxTokens,
      s"stride must be in [1, maxTokens]: $stride")
    val lastChunk = IntOps.intDiv(
      greatest(col("__n") - maxTokens, lit(0L)) + lit(stride - 1), lit(stride))
    df.withColumn("__ts", TextFunctions.tokens(col(textCol)))
      .withColumn("__n", size(col("__ts")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L), lastChunk)))
      .withColumn("chunk_text",
        array_join(slice(col("__ts"),
          (col("chunk_id") * stride + 1).cast("int"), lit(maxTokens)), " "))
      .withColumn("n_chunk_tokens",
        least(lit(maxTokens.toLong), col("__n") - col("chunk_id") * stride))
      .drop("__ts", "__n")
  }
}
