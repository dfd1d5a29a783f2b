package graft.operators

import graft.functions.{PortableHash, WinnowExpressions}
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
  * 60-bit hashes are `transform`s, and the per-window rightmost-min
  * selection is ONE native O(n) monotonic-deque pass
  * ([[graft.functions.WinnowSelectExpr]] — compiled, not an interpreted
  * HOF fold; see [[fingerprintsHof]] for the pinned reference form).
  * The hash is the corpus-portable md5-60 family, so the DuckDB oracle
  * replays the whole selection bit-for-bit (q170).
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
    selectFromGramHashes(docs
      .select(col(idCol), col(tokensCol).as("__t"))
      .filter(size(col("__t")) >= k + w - 1) // at least one complete window
      .withColumn("__hs", tokenGramHashes(col("__t"), k)), idCol, w)
  }

  /** The same selection over CHARACTER k-grams of a string column —
    * robust to tokenization differences (re-wrapped whitespace, joined
    * or re-split tokens shift every token gram but leave most char
    * grams intact). Gram i = chars i..i+k-1 of the raw string; the
    * match guarantee becomes: any shared substring of >= w + k − 1
    * CHARACTERS shares a selected fingerprint.
    */
  def fingerprintsChars(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, w: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    selectFromGramHashes(docs
      .select(col(idCol), col(textCol).as("__x"))
      .filter(length(col("__x")) >= k + w - 1)
      .withColumn("__hs", charGramHashes(col("__x"), k)), idCol, w)
  }

  /** Portable 60-bit hashes of the token k-grams of `toks` (0-based gram
    * i = tokens i..i+k-1, space-joined before hashing).
    */
  def tokenGramHashes(toks: Column, k: Int): Column = transform(
    transform(sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))),
    g => PortableHash.hash60(g))

  /** Portable 60-bit hashes of the character k-grams of string `text`. */
  def charGramHashes(text: Column, k: Int): Column = transform(
    sequence(lit(1), length(text) - (k - 1)),
    i => PortableHash.hash60(text.substr(i, lit(k))))

  /** Common tail: native rightmost-min window selection over a prepared
    * (idCol, __hs: array<long>) frame, exploded to one row per selected
    * fingerprint.
    */
  private def selectFromGramHashes(prepared: DataFrame, idCol: String,
                                   w: Int): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    prepared
      .select(col(idCol),
        explode(WinnowExpressions.winnowSelect(col("__hs"), w)).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))
  }

  /** The pre-native HOF formulation, kept as the PINNED PARITY REFERENCE
    * for [[fingerprints]] (WinnowingSpec pins bit-equality): each
    * window's winner is an `aggregate` fold with `<=` so a later equal
    * hash replaces the incumbent — O(n·w) interpreted lambdas per doc.
    */
  def fingerprintsHof(docs: DataFrame, idCol: String, tokensCol: String,
                      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val toks = col(tokensCol)
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
      .filter(size(col("__t")) >= k + w - 1)
      .withColumn("__hs", tokenGramHashes(col("__t"), k))
      .withColumn("__sel", transform(
        sequence(lit(0), size(col("__hs")) - w),
        s => winner(col("__hs"), s)))
      .select(col(idCol), explode(array_distinct(col("__sel"))).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))
  }

  /** Append selected fingerprints into the fp-BUCKETED winnow index
    * store — the plagiarism/overlap index as a maintained table rather
    * than a per-query derivation. Rows are (doc_id, pos, fp), bucketed
    * by fp: the probe ([[matchesStored]]) self-joins on fp, so the
    * bucketing keeps BOTH sides of the match query exchange-free — at
    * the 100 TB steady state the corpus-side fingerprints never shuffle.
    * `fps` is a [[fingerprints]]/[[fingerprintsChars]] output frame
    * whose first column is the document id.
    */
  def appendToStore(fps: DataFrame, idCol: String, table: String,
                    buckets: Int): Unit =
    fps.select(col(idCol).as("doc_id"), col("pos"), col("fp"))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "fp").sortBy("fp")
      .saveAsTable(table)

  /** One-shot batch build of the char-gram winnow index store: the
    * rebuild contract (drop + fresh) of the other store families.
    */
  def buildStore(docs: DataFrame, idCol: String, textCol: String,
                 table: String, buckets: Int, k: Int = 8, w: Int = 6): Unit = {
    graft.sources.Sinks.dropTableAndStaleLocation(docs.sparkSession, table)
    appendToStore(fingerprintsChars(docs, idCol, textCol, k, w), idCol,
      table, buckets)
  }

  /** Shared-fingerprint match pairs SERVED from a persisted winnow index
    * ([[buildStore]] or the streaming ingest) — the q171 probe shape
    * over the store: documents sharing >= `minShared` selected
    * fingerprints. The (doc_id, fp) dedup first is the crash-window
    * guard (a streaming replay can re-append a batch; a duplicated
    * fingerprint row would inflate shared counts) and it stays
    * exchange-free — the store's fp bucketing satisfies the dedup's and
    * the self-join's clustering alike, so only the pair-sized aggregate
    * shuffles.
    *
    * `maxDocsPerFp` drops STOP-FINGERPRINTS — ones appearing in more
    * documents than the cap — before pairing, exactly as MOSS ignores
    * over-common fingerprints: a fingerprint shared by thousands of
    * documents is boilerplate (a header, a template line) that carries
    * no match evidence yet contributes g² pairs. MEASURED at sf0.1: one
    * 2,758-doc fingerprint alone contributed 3.8M of 9.5M total pairs
    * (16 s); cap 100 leaves the discriminative matches at a pair set
    * two orders smaller. The cap is part of the probe's SEMANTICS (the
    * CoEngagement per-user cap in index form), not an approximation.
    */
  def matchesStored(spark: org.apache.spark.sql.SparkSession, table: String,
                    minShared: Long = 2L,
                    maxDocsPerFp: Long = 1000L): DataFrame = {
    val u = spark.table(table).select(col("doc_id"), col("fp")).distinct()
    val keep = u.groupBy(col("fp")).agg(count(lit(1)).as("__g"))
      .filter(col("__g") <= maxDocsPerFp).select(col("fp"))
    val uk = u.join(keep, "fp")
    uk.select(col("doc_id").as("doc_a"), col("fp"))
      .join(uk.select(col("doc_id").as("doc_b"), col("fp")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
