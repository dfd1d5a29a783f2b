package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact token-set Jaccard similarity join via PREFIX FILTERING (the
  * AllPairs/PPJoin candidate rule — Bayardo et al. 2007, Xiao et al. 2008):
  * the scalable sibling of q43's bounded cross join and the MinHash/LSH
  * family's exact cousin. Where LSH banding (operators/Dedup.scala) trades
  * recall for blocking, prefix filtering is LOSSLESS: order every record's
  * tokens by one global rarity order; a record of n tokens keeps a prefix
  * of p = ⌊n·(1−τ)⌋+1 rarest tokens; any pair with Jaccard ≥ τ must share
  * ≥⌈τ·n⌉ tokens, which cannot all hide in the n−p = ⌈τ·n⌉−1 suffix
  * positions — so every qualifying pair collides on some prefix token and
  * the exact array-intersection verify never misses.
  *
  * Scale shape: document frequencies are one map-side-combined count;
  * per-record ordering is a sort of each record's OWN tokens (no global
  * sort); candidates are an equi-join on the prefix token — the rarest
  * tokens in the corpus, so bucket sizes are the SMALLEST frequency tail,
  * never a cartesian; pairs deduplicate before the verify so each
  * candidate costs one intersection. Float discipline: prefix lengths and
  * the length filter use a +1e-6 slack so IEEE rounding can only OVER-
  * cover candidates (completeness is never at the mercy of a rounded
  * τ·n crossing an integer); the final `jaccard ≥ τ` verify is a single
  * division of exact integer sizes, bit-identical to any engine that
  * evaluates the same definition.
  */
object SetSimJoin {

  /** All unordered pairs (doc_a < doc_b) with exact Jaccard ≥ tau over the
    * distinct elements of `tokensCol`, with the similarity. Records with
    * empty token sets never pair (Jaccard undefined).
    */
  def joinSelf(df: DataFrame, idCol: String, tokensCol: String, tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")

    val docs = df.select(col(idCol).as("doc_id"), array_distinct(col(tokensCol)).as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") > 0)

    val tok = docs.select(col("doc_id"), col("n"), explode(col("ts")).as("tok"))
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))

    // each record's tokens in (rarity, token) order; prefix length with
    // upward slack — over-covering by one token on an exact τ·n boundary
    // is harmless, under-covering would lose pairs
    val ordered = tok.join(dfreq, "tok")
      .groupBy(col("doc_id"), col("n"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("o"))
      .withColumn("ots", transform(col("o"), s => s.getField("tok")))
      .withColumn("p",
        (floor(col("n") * lit(1.0 - tau) + lit(1e-6)) + 1).cast("int"))
      .select(col("doc_id"), col("n"), col("ots"), col("p"))

    val pre = ordered.select(col("doc_id"), col("n"),
      explode(slice(col("ots"), lit(1), col("p"))).as("ptok"))
    val cand = pre.select(col("doc_id").as("doc_a"), col("n").as("na"), col("ptok"))
      .join(pre.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("ptok")), "ptok")
      .filter(col("doc_a") < col("doc_b"))
      // length filter (min ≥ τ·max follows from Jaccard ≥ τ); slack keeps
      // it prune-only at float boundaries
      .filter(col("na") >= col("nb") * tau - lit(1e-6) &&
        col("nb") >= col("na") * tau - lit(1e-6))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    val withSets = cand
      .join(ordered.select(col("doc_id").as("doc_a"), col("ots").as("ta")), "doc_a")
      .join(ordered.select(col("doc_id").as("doc_b"), col("ots").as("tb")), "doc_b")

    val inter = size(array_intersect(col("ta"), col("tb")))
    withSets
      .withColumn("jaccard",
        inter.cast("double") / (size(col("ta")) + size(col("tb")) - inter))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
