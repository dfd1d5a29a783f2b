package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): from each document's k-gram hash sequence, keep
  * the MINIMUM hash of every w-wide window, ties to the RIGHTMOST
  * position. The selection guarantee is what plain every-i-th or
  * mod-p fingerprinting lacks: any match of length >= w + k − 1 between
  * two documents shares at least one SELECTED fingerprint (the window
  * covering the match picks the same minimum in both), while density
  * stays ~2/(w+1) of positions — the local-sampling property that makes
  * fingerprint indexes robust to insertions/deletions shifting gram
  * positions.
  *
  * Everything is per-document array arithmetic inside ONE projection —
  * no shuffle, no join, no window operator: grams and their portable
  * 60-bit hashes are `transform`s, each window's rightmost-min is a
  * fold over w elements (O(n·w) per doc, w is small), and the distinct
  * selected (position, hash) pairs explode at the end. The hash is the
  * corpus-portable md5-60 family, so the DuckDB oracle replays the
  * whole selection bit-for-bit (q170).
  *
  * Contract: documents with fewer than k tokens have no grams; fewer
  * than w grams, no complete window — both are excluded rather than
  * fingerprinted from a short window (the standard guarantee only
  * speaks for complete windows).
  */
object Winnowing {

  /** One row per SELECTED fingerprint: (idCol, pos, fp) — `pos` is the
    * 0-based k-gram position, `fp` its 60-bit hash. `k` = tokens per
    * gram, `w` = window width in grams.
    */
  def fingerprints(docs: DataFrame, idCol: String, tokensCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val toks = col(tokensCol)
    // 0-based gram i = tokens i..i+k-1 (slice is 1-based); window start s
    // selects the rightmost minimum of hs[s .. s+w-1]:
    // fold left with <= so a later equal hash replaces the incumbent
    def winner(hsC: Column, s: Column): Column =
      aggregate(sequence(lit(0), lit(w - 1)),
        struct(lit(Long.MaxValue).as("fp"), lit(-1L).as("pos")),
        (acc, j) => {
          val h = element_at(hsC, (s + j + 1).cast("int"))
          when(h <= acc.getField("fp"),
            struct(h.as("fp"), (s + j).cast("long").as("pos")))
            .otherwise(acc)
        })
    docs
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= k + w - 1) // at least one complete window
      .withColumn("__hs", transform(
        transform(sequence(lit(0), size(col("__t")) - k),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(k)))),
        g => PortableHash.hash60(g)))
      .withColumn("__sel", transform(
        sequence(lit(0), size(col("__hs")) - w),
        s => winner(col("__hs"), s)))
      .select(col(idCol), explode(array_distinct(col("__sel"))).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))
  }
}
