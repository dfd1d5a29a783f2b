package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — fixed-size frequency estimation over an unbounded
  * token stream (Cormode & Muthukrishnan 2005): `depth` hash rows ×
  * `width` buckets of counts; a token's estimated frequency is the MIN of
  * its bucket counts across rows, which never under-estimates and
  * over-estimates by at most the collision mass of a row.
  *
  * Scale shape: the sketch build is one `groupBy (row, bucket)` with
  * map-side partial aggregation — every task emits at most depth·width
  * partial rows, so the exchange carries sketch-sized data regardless of
  * corpus size, and the finished sketch (≤ depth·width rows) broadcasts
  * for estimation. The hash rows reuse the engine's portable 60-bit
  * rotate-xor family ([[graft.functions.PortableHash]]), so the DuckDB
  * oracle replays the sketch bit-identically — the estimates are
  * deterministic functions of the corpus, not RNG draws.
  */
object CountMin {

  /** The d (rotation, xor) pairs defining the sketch's hash rows. */
  def rowConstants(depth: Int, seed: Long = 42L): Seq[(Int, Long)] =
    PortableHash.permConstants(depth, seed)

  /** Bucket of a token under hash row (rot, xorConst): permuted 60-bit
    * hash mod width — non-negative, so `%` agrees across engines.
    */
  def bucketOf(token: Column, rot: Int, xorConst: Long, width: Int): Column =
    PortableHash.permute(PortableHash.hash60(token), rot, xorConst) % width

  /** The depth (j, bucket) structs from an ALREADY-STAGED 60-bit hash
    * column: the md5 is the expensive part and every row's bucket is a
    * cheap integer permute of the same hash, so the hash is bound once
    * per token (the staged-projection discipline — an inlined
    * `hash60(token)` tree repeated per row re-runs md5 depth times).
    */
  private def rowBucketsOf(h60: Column, depth: Int, width: Int,
                           seed: Long): Column =
    array(rowConstants(depth, seed).zipWithIndex.map { case ((r, c), j) =>
      struct(lit(j).as("j"),
        (PortableHash.permute(h60, r, c) % width).as("bucket"))
    }: _*)

  /** Build the sketch table (j, bucket, cnt) from one token occurrence per
    * input row.
    */
  def sketch(tokens: DataFrame, tokenCol: String, depth: Int, width: Int,
             seed: Long = 42L): DataFrame = {
    require(depth > 0, "depth must be positive")
    require(width > 0, "width must be positive")
    tokens
      .select(PortableHash.hash60(col(tokenCol)).as("__h60"))
      .select(explode(rowBucketsOf(col("__h60"), depth, width, seed)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate each probe row's token frequency as `est_n` = min over
    * the sketch's rows of the token's bucket count (0 if a bucket is
    * empty — only possible for tokens the sketch never saw). The sketch
    * side is broadcast; probes keep all their columns.
    */
  def estimate(sk: DataFrame, probes: DataFrame, tokenCol: String,
               depth: Int, width: Int, seed: Long = 42L): DataFrame = {
    val pjb = probes.select(col(tokenCol)).distinct()
      .withColumn("__h60", PortableHash.hash60(col(tokenCol)))
      .withColumn("jb", explode(rowBucketsOf(col("__h60"), depth, width, seed)))
      .drop("__h60")
    val est = pjb
      .join(broadcast(sk),
        pjb("jb.j") === sk("j") && pjb("jb.bucket") === sk("bucket"), "left")
      .groupBy(pjb(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
    probes.join(broadcast(est), Seq(tokenCol))
  }

  /** Merge two sketches built with the SAME (depth, width, seed): CMS is
    * linear, so the cell-wise sum equals the sketch of the concatenated
    * corpora EXACTLY (pinned in CountMinSpec) — an ingest pipeline keeps
    * one running sketch and merges each batch's, never rescanning.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("j"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  // ---- xxhash64 fast path — the production family (the same fast /
  // portable split as the MinHash and SimHash operators: md5 keeps the
  // gate oracle-able, xxhash64 is ~an order of magnitude cheaper per
  // token). Same sketch table schema, same estimate/merge semantics —
  // `merge` works across either family's sketches (never mix families
  // in one sketch: bucket functions differ). ----

  /** Bucket of a token under fast hash row j: xxhash64(token, j) folded
    * non-negative with pmod (xxhash64 is full-range signed).
    */
  def bucketOfFast(token: Column, j: Int, width: Int): Column =
    pmod(xxhash64(token, lit(j)), lit(width.toLong))

  private def rowBucketsFast(token: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { j =>
      struct(lit(j).as("j"), bucketOfFast(token, j, width).as("bucket"))
    }: _*)

  /** [[sketch]] on the xxhash64 family — identical shape (one map-side-
    * combined groupBy, sketch-sized exchange), cheaper per-token work.
    */
  def sketchFast(tokens: DataFrame, tokenCol: String, depth: Int,
                 width: Int): DataFrame = {
    require(depth > 0, "depth must be positive")
    require(width > 0, "width must be positive")
    tokens
      .select(explode(rowBucketsFast(col(tokenCol), depth, width)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[sketchFast]] as ONE native aggregate ([[graft.functions.CmsSketchAgg]])
    * — the production build: no depth-× row explosion before the partial
    * aggregate; each map task folds tokens straight into a depth·width
    * long-array buffer and the exchange carries one buffer per task
    * (depth·width·8 bytes) regardless of corpus size. Cell-for-cell equal
    * to [[sketchFast]] (pinned in CountMinSpec), same (j, bucket, cnt)
    * table out, so [[estimateFast]] and [[merge]] work unchanged.
    */
  def sketchAggFast(tokens: DataFrame, tokenCol: String, depth: Int,
                    width: Int): DataFrame = {
    require(depth > 0, "depth must be positive")
    require(width > 0, "width must be positive")
    tokens
      .agg(graft.functions.CmsSketchAgg.cells(col(tokenCol), depth, width)
        .as("cells"))
      .select(posexplode(col("cells")).as(Seq("pos", "cnt")))
      .filter(col("cnt") > 0L)
      .select(
        graft.functions.IntOps.intDiv(col("pos"), lit(width.toLong))
          .cast("int").as("j"),
        pmod(col("pos").cast("long"), lit(width.toLong)).as("bucket"),
        col("cnt"))
  }

  /** [[estimate]] against a [[sketchFast]]-built sketch. */
  def estimateFast(sk: DataFrame, probes: DataFrame, tokenCol: String,
                   depth: Int, width: Int): DataFrame = {
    val pjb = probes.select(col(tokenCol)).distinct()
      .withColumn("jb", explode(rowBucketsFast(col(tokenCol), depth, width)))
    val est = pjb
      .join(broadcast(sk),
        pjb("jb.j") === sk("j") && pjb("jb.bucket") === sk("bucket"), "left")
      .groupBy(pjb(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
    probes.join(broadcast(est), Seq(tokenCol))
  }

  // ---- heavy hitters: sketch-prefilter + exact verify ----

  /** Every token whose frequency is ≥ ceil(phi · N) (N = total token
    * occurrences), as (token, exact_n, est_n) — EXACT results found
    * WITHOUT ever grouping the full corpus by token.
    *
    * Two passes over the data, both scale-shaped:
    *   1. the CMS build — sketch-sized exchange ([[sketchAggFast]] /
    *      [[sketch]]);
    *   2. a MAP-ONLY prefilter: the finished sketch collects into
    *      depth literal arrays (bounded: depth·width cells, ~2 MB at
    *      4×65536) and each occurrence's estimate is a `least` of
    *      `element_at` lookups — CMS never under-estimates, so dropping
    *      occurrences with est < threshold can never drop a true heavy
    *      hitter. Only survivors (per-key frequency ≥ φN by definition,
    *      so ≤ 1/φ distinct keys plus collision false-positives) reach
    *      the exact groupBy, whose map-side combine collapses them to a
    *      few rows per task. The exact count then removes the false
    *      positives: the RESULT is exact; the sketch only buys the plan.
    *
    * The estimate itself rides along as `est_n` (≥ `exact_n` by
    * construction, pinned in CountMinSpec).
    */
  def heavyHittersFast(tokens: DataFrame, tokenCol: String, phi: Double,
                       depth: Int, width: Int): DataFrame =
    heavyHittersFrom(tokens, tokenCol, phi, depth, width,
      sketchAggFast(tokens, tokenCol, depth, width),
      (tok, j) => pmod(xxhash64(tok, lit(j)), lit(width.toLong)))

  /** [[heavyHittersFast]] on the portable md5 family — the oracle-able
    * gate formulation.
    */
  def heavyHitters(tokens: DataFrame, tokenCol: String, phi: Double,
                   depth: Int, width: Int, seed: Long = 42L): DataFrame = {
    val consts = rowConstants(depth, seed)
    heavyHittersFrom(tokens, tokenCol, phi, depth, width,
      sketch(tokens, tokenCol, depth, width, seed),
      (tok, j) => {
        val (r, c) = consts(j)
        PortableHash.permute(PortableHash.hash60(tok), r, c) % width
      })
  }

  /** Shared heavy-hitter core over a built sketch. `bucketOf(token, j)`
    * yields hash row j's bucket for a raw token column.
    */
  private def heavyHittersFrom(tokens: DataFrame, tokenCol: String,
                               phi: Double, depth: Int, width: Int,
                               sk: DataFrame,
                               bucketOf: (Column, Int) => Column): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, "phi must be in (0, 1]")
    // Bounded driver read: the sketch is ≤ depth·width cells by
    // construction (the same broadcast-sketch contract as estimate()).
    val cells = Array.fill(depth)(new Array[Long](width))
    sk.collect().foreach { r =>
      cells(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2)
    }
    val total = cells(0).sum // row 0 counts every occurrence exactly once
    val thresh = math.max(1L, math.ceil(phi * total).toLong)

    def lookup(tok: Column, j: Int): Column =
      element_at(typedLit(cells(j).toSeq), bucketOf(tok, j).cast("int") + 1)

    // min ≥ t ⟺ EVERY row's bucket ≥ t, so the prefilter is a
    // conjunction, not a `least(...) ≥ t`: FilterExec splits conjuncts
    // and short-circuits, so a typical (non-heavy) occurrence pays ONE
    // hash-row evaluation — this beats staging the hash in a projection,
    // which predicate pushdown would re-inline anyway (the round-7
    // pushdown-inlining lesson).
    val survivors = tokens.filter(
      (0 until depth).map(j => lookup(col(tokenCol), j) >= thresh)
        .reduce(_ && _))
    survivors
      .groupBy(col(tokenCol)).agg(count(lit(1)).as("exact_n"))
      .filter(col("exact_n") >= thresh)
      .select(col(tokenCol), col("exact_n"),
        (0 until depth).map(lookup(col(tokenCol), _))
          .reduce((a, b) => least(a, b)).as("est_n"))
  }
}
