package graft.ops

import graft.functions.IntOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood record-linkage blocking (Hernández & Stolfo 1995,
  * the merge/purge method): sort records by a blocking key, slide a
  * window of `window` POSITIONS, and verify only pairs inside the
  * window. The third blocking family next to [[FuzzyJoin]]'s deletion
  * neighborhoods and [[PassJoin]]'s segments, with a different contract:
  * those are LOSSLESS for small edit radii; sorted-neighborhood is
  * bounded-and-linear by DESIGN — pairs whose keys sort far apart are
  * out of reach (the classic trade: one cheap sort + O(n·w) candidates,
  * robust to errors anywhere but the key's leading characters). The
  * window is part of the semantics, like the co-engagement cap.
  *
  * Scale shape: global positions come from the [[PrefixSum]]
  * range-partition decomposition (one range exchange + per-partition
  * scan — NEVER a single-task window); the neighbor join is an
  * equi-join on the position block (block = pos div window, each right
  * row replicated into its own and the previous block, so every
  * in-window pair meets in exactly one block), bounded at ~2w rows per
  * block — never a cartesian. The verify predicate (exact Levenshtein ≤
  * maxLev) sits above the join.
  */
object SortedNeighborhood {

  /** (id_a, id_b, lev) for window-mates with levenshtein(key) <= maxLev,
    * oriented by sort position (a precedes b). Sort order is the TOTAL
    * order (key, id), so positions — and the candidate set — replay
    * exactly.
    */
  def candidates(df: DataFrame, idCol: String, keyCol: String,
                 window: Int, maxLev: Int): DataFrame =
    onePass(df.select(col(idCol).as("id"), col(keyCol).as("sk"),
      col(keyCol).as("vrf")), window, maxLev)
      .select(col("id_a"), col("id_b"), col("lev"))

  /** MULTI-PASS sorted-neighborhood — the standard recall repair for the
    * single sort's blind spot (an error in the key's LEADING characters
    * scatters a true pair across the sort; it is usually intact under a
    * second ordering — the classic pairing is the key plus its
    * reversal, or a second attribute): one pass per key in `keys`,
    * every pass verifying the same `verifyCol`, pairs canonicalized to
    * id_a < id_b and deduplicated across passes. Cost is additive in
    * passes; each stays bounded-and-linear.
    */
  def candidatesMultiPass(df: DataFrame, idCol: String, verifyCol: String,
                          keys: Seq[Column], window: Int,
                          maxLev: Int): DataFrame = {
    require(keys.nonEmpty, "at least one sort key")
    keys.map { k =>
      onePass(df.select(col(idCol).as("id"), k.as("sk"),
        col(verifyCol).as("vrf")), window, maxLev)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"), col("lev"))
    }.reduce(_ unionByName _).distinct()
  }

  /** One windowed pass over (id, sk, vrf): positions by (sk, id), the
    * block equi join, Levenshtein on `vrf`. Orientation is positional
    * (a precedes b in THIS pass's order).
    */
  private def onePass(recs: DataFrame, window: Int, maxLev: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(maxLev >= 0, s"maxLev must be >= 0, got $maxLev")
    val pos = PrefixSum.exclusiveCumsum(recs,
      Seq(col("sk"), col("id")), lit(1L), "pos")
      .withColumn("blk", IntOps.intDiv(col("pos"), lit(window.toLong)))
    val a = pos.select(col("id").as("id_a"), col("vrf").as("v_a"),
      col("pos").as("pos_a"), col("blk"))
    val b = pos.select(col("id").as("id_b"), col("vrf").as("v_b"),
      col("pos").as("pos_b"), col("blk"))
    val bShift = b.unionByName(b.withColumn("blk", col("blk") - 1))
    a.join(bShift, Seq("blk"))
      .filter(col("pos_b") > col("pos_a") &&
        col("pos_b") - col("pos_a") < window)
      .withColumn("lev", levenshtein(col("v_a"), col("v_b")).cast("long"))
      .filter(col("lev") <= maxLev)
      .select(col("id_a"), col("id_b"), col("lev"))
  }
}
