package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance join for thresholds d >= 3 — PassJoin segment blocking
  * (Li, Deng, Feng 2011, "PassJoin: a partition-based method for
  * similarity joins"). [[FuzzyJoin]]'s deletion neighborhoods are the
  * right tool at d <= 2 but generate C(len, d) variants per string —
  * cubic-and-worse in length at d = 3 — so FuzzyJoin refuses there and
  * points here.
  *
  * Blocking is LOSSLESS for levenshtein <= d: partition the indexed
  * string r into d+1 contiguous segments. Any optimal edit script
  * between r and s has <= d edits, so at least one segment contains no
  * edit (pigeonhole) and therefore appears in s VERBATIM, shifted from
  * its home position by δ = net insertions-minus-deletions strictly
  * before it. The shift window is the MULTI-MATCH-AWARE bound: with
  * Δ = len(s) − len(r), the prefix alignment costs ≥ |δ| edits and the
  * suffix alignment ≥ |Δ − δ| — disjoint edit sets — so |δ| + |Δ−δ| ≤ d,
  * i.e. δ ∈ [min(0,Δ) − ⌊(d−|Δ|)/2⌋, max(0,Δ) + ⌊(d−|Δ|)/2⌋], a window
  * at most d+1 wide (the naive ±d is 2d+1 — measured ~2× the candidate
  * pairs on the q125 corpus). Joining r's segments against s's
  * substrings of the same length inside that window (and only for
  * partner lengths within ±d — the length pruning levenshtein itself
  * implies) finds every true pair; the exact, codegen'd `levenshtein`
  * verify removes false candidates.
  *
  * Scale shape: segment and probe keys are generated per-row (no
  * shuffle, pure codegen'd array expressions), the candidate join is a
  * plain equi-join on (partner_len, segment_idx, substring) — never a
  * cartesian — and the pair-dedup shuffles ONLY (id_a, id_b): the
  * string payloads are re-attached afterwards by key join (broadcast
  * when the corpus side is dim-sized), so the widest exchange carries
  * two ids per candidate, not two strings. Each surviving pair costs
  * ONE distance evaluation. Probe fan-out is O(d²·(d+1)) keys per row —
  * independent of string length, unlike the deletion neighborhood.
  * Segment keys hash-distribute by content; a corpus of near-identical
  * strings degrades toward its true pair count, not toward all-pairs.
  *
  * Ids must be UNIQUE keys of their frames (the re-attach join relies
  * on it) — the standard record-linkage contract.
  */
object PassJoin {

  /** Start/length of 0-based segment `i` in the (d+1)-way even partition
    * of a length-`l` string: the first (d+1 − l mod (d+1)) segments get
    * ⌊l/(d+1)⌋ chars, the rest one more — starts are then prefix sums.
    */
  private def scheme(l: Column, i: Column, d: Int): (Column, Column) = {
    val q = floor(l.cast("double") / lit(d + 1.0)).cast("int")
    val rem = pmod(l, lit(d + 1))
    val nshort = lit(d + 1) - rem
    val len = q + when(i >= nshort, lit(1)).otherwise(lit(0))
    val start = lit(1) + i * q + greatest(lit(0), i - nshort)
    (start, len)
  }

  private val keyType = "array<struct<l:int,i:int,sub:string>>"

  /** The d+1 (own_len, i, segment) index keys of a string — the side
    * whose segmentation the pigeonhole argument runs on.
    */
  def segmentKeys(s: Column, d: Int): Column = {
    val n = length(s)
    transform(sequence(lit(0), lit(d)), i => {
      val (st, len) = scheme(n, i, d)
      struct(n.as("l"), i.as("i"), s.substr(st, len).as("sub"))
    })
  }

  /** All (partner_len, i, substring) probe keys of a string: for every
    * partner length l in [n−d, n] (or [n−d, n+d] with `alsoLonger`, the
    * two-table form), every segment of scheme(l), every start inside the
    * multi-match-aware shift window (scaladoc above). `array_distinct`
    * collapses probes that read identical substrings.
    */
  def probeKeys(s: Column, d: Int, alsoLonger: Boolean = false): Column = {
    val n = length(s)
    val lHi = if (alsoLonger) n + d else n
    array_distinct(flatten(flatten(
      transform(sequence(greatest(n - d, lit(0)), lHi), l =>
        transform(sequence(lit(0), lit(d)), i => {
          val (st, len) = scheme(l, i, d)
          val delta = n - l
          val slack = floor((lit(d) - abs(delta)).cast("double") / 2.0).cast("int")
          val lo = greatest(lit(1), st + least(lit(0), delta) - slack)
          val hi = least(n - len + lit(1), st + greatest(lit(0), delta) + slack)
          when(lo <= hi,
            transform(sequence(lo, hi), p =>
              struct(l.as("l"), i.as("i"), s.substr(p, len).as("sub"))))
            .otherwise(array().cast(keyType))
        })))))
  }

  /** Link `left` to `right`: every (id_a, id_b) with
    * levenshtein(name_a, name_b) <= maxDist, with the exact distance.
    * Left rows are indexed by their segments; right rows probe partner
    * lengths BOTH ways, so neither side needs to be the shorter one.
    */
  def link(left: DataFrame, right: DataFrame,
           leftId: String, leftStr: String,
           rightId: String, rightStr: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val lv = left.select(col(leftId).as("id_a"),
      explode(segmentKeys(col(leftStr), maxDist)).as("__k"))
    val rv = right.select(col(rightId).as("id_b"),
      explode(probeKeys(col(rightStr), maxDist, alsoLonger = true)).as("__k"))
    val pairs = lv.join(rv, "__k")
      .select(col("id_a"), col("id_b")).distinct()
    pairs
      .join(left.select(col(leftId).as("id_a"), col(leftStr).as("name_a")), "id_a")
      .join(right.select(col(rightId).as("id_b"), col(rightStr).as("name_b")), "id_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("name_a"), col("id_b"), col("name_b"), col("dist"))
  }

  /** Self-linkage: unordered pairs (id_a < id_b) within `maxDist`. Probes
    * cover only partner lengths <= own length — each pair is found from
    * the SHORTER side's segmentation (both sides when lengths tie), so
    * the probe fan-out is half the two-table form's.
    */
  def linkSelf(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val d = maxDist
    val segs = df.select(col(idCol).as("__ida"),
      explode(segmentKeys(col(strCol), d)).as("__k"))
    val probes = df.select(col(idCol).as("__idb"),
      explode(probeKeys(col(strCol), d)).as("__k"))
    val pairs = segs.join(probes, "__k")
      .filter(col("__ida") =!= col("__idb"))
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"))
      .distinct()
    pairs
      .join(df.select(col(idCol).as("id_a"), col(strCol).as("name_a")), "id_a")
      .join(df.select(col(idCol).as("id_b"), col(strCol).as("name_b")), "id_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= d)
      .select(col("id_a"), col("name_a"), col("id_b"), col("name_b"), col("dist"))
  }
}
