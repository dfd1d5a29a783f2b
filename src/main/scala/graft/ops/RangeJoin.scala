package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Scale-safe interval containment join (beyond the reference's equi-only
  * joins — SURVEY §2.5 notes no range joins exist there).
  *
  * The naive plan for `probe.t BETWEEN interval.start AND interval.end` with
  * no equi key is a broadcast-nested-loop / cartesian join — O(|probe|·|iv|)
  * comparisons, which does not survive a 100× scale-up. This operator turns
  * the containment predicate into an equi join on a derived bucket key:
  * each interval is exploded onto every fixed-width bucket it covers, each
  * probe row belongs to exactly one bucket, and the equi join + residual
  * filter evaluates only the pairs that share a bucket. Cost is
  * O(|probe| + |iv|·span/width + matched pairs) with an ordinary shuffled
  * hash join — the same blocking idea DuckDB's IEJoin or Spark's Range Join
  * hints apply, expressed with plain DataFrame primitives.
  *
  * No dedup step is needed: a probe row joins an interval only through the
  * probe's own single bucket, so each (probe, interval) pair appears at most
  * once.
  *
  * @param probe       fact side; `probeTime` must be an integral column
  *                    (epoch day / epoch second / any monotone int encoding)
  * @param intervals   interval side with integral `startCol`/`endCol`
  *                    (half-open: start inclusive, end exclusive)
  * @param bucketWidth bucket size in the same units; pick ~ the median
  *                    interval span so intervals explode into O(1) buckets
  */
object RangeJoin {

  /** Floor-division bucket of an integral value (round toward -inf for
    * negative epochs): a double round-trip would lose precision past 2^53
    * and silently drop matches for nanosecond-scale encodings. `Column./`
    * is double division, so the exact quotient goes through Catalyst's
    * IntegralDivide (`div`).
    */
  private def bucketOfW(c: Column, w: Column): Column = {
    val v = c.cast("long")
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(v - pmod(v, w)),
        org.apache.spark.sql.GraftColumnBridge.expression(w)))
  }

  def bucketedContainment(probe: DataFrame, probeTime: Column,
                          intervals: DataFrame, startCol: Column, endCol: Column,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    def bucketOf(c: Column): Column = bucketOfW(c, w)
    val iv = intervals
      .withColumn("__start", startCol.cast("long"))
      .withColumn("__end", endCol.cast("long"))
      .filter(col("__end") > col("__start"))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col("__start")), bucketOf(col("__end") - 1))))
    val p = probe
      .withColumn("__t", probeTime.cast("long"))
      .withColumn("__bucket", bucketOf(col("__t")))
    p.join(iv, Seq("__bucket"))
      .filter(col("__t") >= col("__start") && col("__t") < col("__end"))
      .drop("__bucket", "__t", "__start", "__end")
  }

  /** Interval×interval OVERLAP join (half-open: a.s < b.e AND b.s < a.e)
    * by the same fixed-width bucketing: both sides explode onto their
    * covered buckets and equi-join per bucket. A pair sharing several
    * buckets is emitted EXACTLY once without any distinct/shuffle-dedup:
    * the pair is kept only in the bucket containing max(a.start, b.start)
    * — the overlap's first instant, which both intervals provably cover.
    * An ordinary shuffled hash join — never the BNLJ cartesian the raw
    * non-equi condition plans.
    *
    * Cost model: each bucket is a local cross product, so candidates ≈
    * Σ_buckets |a_b|·|b_b| ≈ densityA·densityB·width per bucket-interval
    * of time — roughly (1 + width/medianSpan)× the true pair count. Pick
    * `bucketWidth` near the median span; on dense data the join is
    * CANDIDATE-bound, not shuffle-bound (measured at sf0.1: ~100 M bucket
    * candidates for 20.6 M real pairs at width 16 — ~5× excess; a
    * single-node sort-based IEJoin examines less, and a partition-local
    * dual-sorted merge scan is the known next step if this op ever tops a
    * profile). At any width the answer is identical (RangeJoinSpec pins
    * widths 1/4/16/1000).
    */
  def bucketedOverlap(a: DataFrame, aStart: Column, aEnd: Column,
                      b: DataFrame, bStart: Column, bEnd: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    def side(df: DataFrame, s: Column, e: Column, p: String): DataFrame =
      df.withColumn(s"__${p}s", s.cast("long"))
        .withColumn(s"__${p}e", e.cast("long"))
        .filter(col(s"__${p}e") > col(s"__${p}s"))
        .withColumn("__bucket", explode(
          sequence(bucketOfW(col(s"__${p}s"), w), bucketOfW(col(s"__${p}e") - 1, w))))
    val ea = side(a, aStart, aEnd, "a")
    val eb = side(b, bStart, bEnd, "b")
    ea.join(eb, Seq("__bucket"))
      .filter(col("__as") < col("__be") && col("__bs") < col("__ae"))
      .filter(col("__bucket") ===
        bucketOfW(greatest(col("__as"), col("__bs")), w))
      .drop("__bucket", "__as", "__ae", "__bs", "__be")
  }

  /** Interval×interval OVERLAP join (half-open: a.s < b.e AND b.s < a.e)
    * as a partition-local dual-sorted merge sweep — the IEJoin-class plan
    * that replaces [[bucketedOverlap]] where the join is candidate-bound
    * (measured at sf0.1: ~100 M bucket candidates for 20.6 M real pairs at
    * width 16 — ~5× wasted comparisons; the sweep examines only real
    * pairs).
    *
    * Plan shape (no Join node at all — the pairing is per-partition
    * imperative logic, the genuine `mapPartitions` case):
    *
    *   1. cut the time axis into `numRanges` data-adaptive ranges at
    *      approximate equi-frequency start quantiles (one distributed
    *      GK-sketch pass; only ≤ numRanges−1 longs reach the driver — the
    *      IVF-centroid bounded-artifact contract);
    *   2. replicate each interval onto every range it intersects (a
    *      factor ≤ numRanges, ≈1 for span ≪ range width — NOT span/width
    *      as in the fixed-width bucket explode) and hash-exchange both
    *      sides together on the range id: ONE shuffle, both sides
    *      co-located;
    *   3. within each range, sweep both sides merged in ascending start
    *      order with min-end heaps of open intervals: evict closed
    *      intervals, pair the current interval with every open interval
    *      of the other side — after eviction EVERY open interval
    *      overlaps, so per-pair work is O(1) beyond the O(n log n) sort.
    *
    * Exactly-once without dedup: a pair is emitted only while processing
    * its LATER-starting member, and only in the range that member is
    * native to (`rid(start)`); the earlier partner provably spans that
    * start, so it is replicated into exactly that range.
    *
    * Memory: the open heaps hold the maximum number of concurrently-open
    * intervals at one instant within one range (the data's clique width),
    * not the partition — dense same-instant cliques imply a quadratic
    * OUTPUT, at which point the output, not the sweep, is the cost.
    *
    * Skew: equi-frequency cuts cannot split EQUAL start values, so a hot
    * instant (many intervals sharing one start) lands in a single range —
    * that task's work is emission-proportional (the pairs genuinely exist
    * and all contain the hot instant), but it is one task; if such data
    * shows up, pre-aggregate identical (start, end, payload) rows with a
    * count and multiply pair weights downstream.
    *
    * Boundary precision: quantile cuts travel as doubles, so start
    * encodings past 2^53 may round cut points — that skews range BALANCE
    * only; membership/ownership are computed in exact long arithmetic and
    * any cut vector yields the identical result (spec-pinned).
    *
    * Column names of `a` and `b` must be disjoint (same contract as the
    * join-based variant's output).
    */
  def sortedOverlap(a: DataFrame, aStart: Column, aEnd: Column,
                    b: DataFrame, bStart: Column, bEnd: Column,
                    numRanges: Int = 0): DataFrame = {
    val spark = a.sparkSession
    val np = if (numRanges > 0) numRanges
             else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val aCols = a.columns.toSeq
    val bCols = b.columns.toSeq
    require(aCols.intersect(bCols).isEmpty,
      s"sortedOverlap requires disjoint column names; shared: ${aCols.intersect(bCols).mkString(", ")}")
    val meta = Seq("__rid", "__native", "__isa", "__s", "__e")
    require(!(aCols ++ bCols).exists(meta.contains),
      s"column names may not collide with ${meta.mkString(", ")}")

    val av = a.withColumn("__s", aStart.cast("long"))
      .withColumn("__e", aEnd.cast("long")).filter(col("__e") > col("__s"))
    val bv = b.withColumn("__s", bStart.cast("long"))
      .withColumn("__e", bEnd.cast("long")).filter(col("__e") > col("__s"))

    // Data-adaptive cut points at equi-frequency start quantiles of BOTH
    // sides — balance only; correctness is cut-invariant.
    val cuts: Array[Long] =
      if (np <= 1) Array.empty
      else {
        val probs = (1 until np).map(_.toDouble / np).toArray
        av.select(col("__s")).unionByName(bv.select(col("__s")))
          .stat.approxQuantile("__s", probs, 0.001)
          .map(_.toLong).distinct.sorted
      }
    // rid(x) = #cuts ≤ x — a codegen'd fold over a ≤(np−1)-element literal.
    def rid(x: Column): Column =
      if (cuts.isEmpty) lit(0)
      else size(filter(typedLit(cuts), c => c <= x))

    val nullsFor = (cols: Seq[String], schema: StructType) =>
      cols.map(c => lit(null).cast(schema(c).dataType).as(c))
    def unify(df: DataFrame, isA: Boolean): DataFrame = {
      val own = (if (isA) aCols else bCols).map(col)
      val aSide = if (isA) aCols.map(col) else nullsFor(aCols, a.schema)
      val bSide = if (isA) nullsFor(bCols, b.schema) else bCols.map(col)
      df.withColumn("__rid0", rid(col("__s")))
        .withColumn("__rid", explode(sequence(col("__rid0"), rid(col("__e") - 1))))
        .select(
          (col("__rid") +: (col("__rid") === col("__rid0")).as("__native") +:
            lit(isA).as("__isa") +: col("__s") +: col("__e") +:
            (aSide ++ bSide)): _*)
    }

    val unioned = unify(av, isA = true).unionByName(unify(bv, isA = false))
      .repartition(np, col("__rid"))
      .sortWithinPartitions(col("__rid"), col("__s"))

    val outSchema = StructType(a.schema.fields ++ b.schema.fields)
    val na = aCols.length
    val nb = bCols.length
    implicit val enc = Encoders.row(outSchema)
    unioned.mapPartitions { rows =>
      // min-end heaps of open intervals per side: (end, own column values)
      val byEnd = Ordering.by[(Long, Array[Any]), Long](_._1).reverse
      val openA = scala.collection.mutable.PriorityQueue.empty(byEnd)
      val openB = scala.collection.mutable.PriorityQueue.empty(byEnd)
      var curRid = Int.MinValue
      rows.flatMap { r =>
        val rRid = r.getInt(0)
        if (rRid != curRid) { openA.clear(); openB.clear(); curRid = rRid }
        val native = r.getBoolean(1)
        val isa = r.getBoolean(2)
        val s = r.getLong(3)
        val e = r.getLong(4)
        while (openA.nonEmpty && openA.head._1 <= s) openA.dequeue()
        while (openB.nonEmpty && openB.head._1 <= s) openB.dequeue()
        val own = new Array[Any](if (isa) na else nb)
        val base = if (isa) 5 else 5 + na
        var i = 0
        while (i < own.length) { own(i) = r.get(base + i); i += 1 }
        val out =
          if (!native) Iterator.empty
          else {
            // every surviving open partner overlaps: partner.s ≤ s < cur.e
            // and partner.e > s by eviction — emit them all.
            val partners = if (isa) openB else openA
            partners.iterator.map { case (_, pv) =>
              val vals = new Array[Any](na + nb)
              val (aVals, bVals) = if (isa) (own, pv) else (pv, own)
              System.arraycopy(aVals, 0, vals, 0, na)
              System.arraycopy(bVals, 0, vals, na, nb)
              Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
            }.toVector.iterator
          }
        (if (isa) openA else openB).enqueue((e, own))
        out
      }
    }
  }
}
