package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, seed-stable sampling and dataset splitting — the
  * train/valid/test machinery of a training-data pipeline. Everything is a
  * pure per-row hash projection (no RNG state, no shuffle, no sort):
  * membership of a row is a function of (salt, id) alone, so splits are
  * reproducible across runs, clusters, AND engines (the 60-bit portable
  * hash is what the DuckDB oracle recomputes), and adding data never
  * reshuffles existing rows between splits — the property that keeps a
  * 100 TB corpus's held-out set stable as new shards land.
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a row id under a salt. */
  def hashBucket(id: Column, salt: String, buckets: Int = 10000): Column =
    PortableHash.hash60(concat(lit(salt + ":"), id.cast("string"))) % buckets

  /** Split label from cumulative percentage cuts, e.g.
    * `Seq("train" -> 80, "valid" -> 90, "test" -> 100)` — row lands in the
    * first split whose cut exceeds its bucket (buckets = 100).
    */
  def splitAssign(id: Column, salt: String,
                  cuts: Seq[(String, Int)] = Seq("train" -> 80, "valid" -> 90, "test" -> 100)): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 100, "cuts must end at 100")
    val b = hashBucket(id, salt, 100)
    cuts.init.foldRight(lit(cuts.last._1): Column) { case ((name, cut), acc) =>
      when(b < cut, name).otherwise(acc)
    }
  }

  /** Deterministic fraction-sample: keeps rows whose bucket falls under
    * `fraction` of the bucket space. Used per stratum by passing a salt per
    * stratum or filtering a pre-bucketed frame.
    */
  def sampleFraction(df: DataFrame, idCol: String, fraction: Double,
                     salt: String, buckets: Int = 10000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(hashBucket(col(idCol), salt, buckets) < (fraction * buckets).toLong)
  }

  /** SQL (DuckDB) expression for [[hashBucket]] — same hash, same value. */
  def hashBucketSql(idExpr: String, salt: String, buckets: Int = 10000): String =
    s"(${PortableHash.hash60Sql(s"'$salt:' || CAST($idExpr AS VARCHAR)")}) % $buckets"

  /** Deterministic stratified FIXED-SIZE sample: the k rows of each group
    * with the smallest portable hash of (salt, id) — the balanced
    * per-class sample (k docs per language, k events per type) that
    * fraction-sampling can't give when strata sizes differ by orders of
    * magnitude. Hash order makes membership reproducible across runs and
    * engines, and independent of input partitioning.
    *
    * Scale note: one shuffle on the group key, then a per-group sort.
    * WindowExec sorts the whole group, so a single colossal stratum makes
    * that task the straggler; when k/|group| is small and group sizes are
    * known, pre-filter with [[sampleFraction]] at a few×(k/|group|) rate
    * under the SAME salt — hash-prefix membership is monotone, so the
    * pre-filter provably contains the final top-k and the window then
    * sorts only the survivors.
    */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       k: Int, salt: String = "strat"): DataFrame = {
    require(k > 0, "k must be positive")
    val h = PortableHash.hash60(concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Weighted reservoir sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES, "Weighted random sampling with a reservoir", IPL 97(5), 2006):
    * item i draws key u_i^(1/w_i) and the k largest keys win, giving
    * first-pick probability w_i/Σw and the exact without-replacement
    * recursion thereafter. The float key is the classic cross-engine trap
    * (pow/ln drift by ULPs and flip top-k boundary ties), so the key here
    * is `max over j in 1..w of hash60(salt:id:j)` — the maximum of w
    * uniform draws, whose CDF x^w is EXACTLY the distribution of
    * u^(1/w) — keeping the whole sample in integer arithmetic:
    * reproducible across runs, partitionings, and engines (the DuckDB
    * oracle replays it bit-for-bit via [[weightedKeySql]]).
    *
    * Scale shape: a pure per-row projection (O(weight) md5 hashes, no
    * RNG state) followed by a global top-k that plans as
    * TakeOrderedAndProject — per-partition heaps and a k-row merge, never
    * a global sort or shuffle of the corpus. The draw expansion bills
    * O(w) hashes per row, the right trade for the integer-exactness win
    * when weights are token-count-sized; `maxWeight` makes an oversized
    * weight fail LOUDLY (never a silent clamp, which would skew inclusion
    * probabilities). Corpora with unbounded raw weights should bucket
    * them first — A-ES only needs relative weights. Rows with weight ≤ 0
    * are excluded (P ∝ w, and w = 0 must never sample).
    *
    * Output: the k sampled rows with their integer `wrs_key` appended
    * (ties broken by id ascending; 60-bit keys make real ties
    * negligible but deterministic).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     salt: String = "wrs", maxWeight: Int = 4096): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxWeight > 0, "maxWeight must be positive")
    val w = col(weightCol).cast("long")
    val wOk = when(w <= lit(maxWeight.toLong), w).otherwise(
      raise_error(concat(
        lit(s"weightedSample: weight exceeds maxWeight=$maxWeight for id="),
        col(idCol).cast("string"))).cast("long"))
    val key = array_max(transform(sequence(lit(1L), wOk), j =>
      PortableHash.hash60(concat(lit(salt + ":"), col(idCol).cast("string"),
        lit(":"), j.cast("string")))))
    df.filter(w > 0)
      .withColumn("wrs_key", key)
      .orderBy(col("wrs_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** DuckDB expression for [[weightedSample]]'s key — same hash family,
    * same draw expansion (list comprehensions correlate where
    * generate_series cannot).
    */
  def weightedKeySql(idExpr: String, weightExpr: String, salt: String): String =
    s"list_max([${PortableHash.hash60Sql(
      s"'$salt:' || CAST($idExpr AS VARCHAR) || ':' || CAST(j AS VARCHAR)")} " +
      s"FOR j IN range(1, ($weightExpr) + 1)])"

  /** Weighted sampling WITH replacement: `k` independent draws, each
    * landing on a row with probability proportional to its weight —
    * inverse-CDF over a distributed prefix sum, NOT k passes over the
    * data:
    *
    *   1. [[graft.ops.PrefixSum.exclusiveCumsum]] lays the weights
    *      end-to-end in `idCol` order (one range exchange — the only
    *      full-data shuffle; the total weight W falls out of the same
    *      pass);
    *   2. draw j's position is `hash60(salt:j) % W` — k deterministic
    *      integer positions computed in-engine, so the DuckDB oracle
    *      replays the exact sample;
    *   3. each draw finds its row by interval containment
    *      (`start ≤ pos < start + w`) against the k-row broadcast —
    *      a map-side nested-loop probe, k comparisons per row.
    *
    * Returns (draw_id, id, w); the same row appears once per draw that
    * hit it (that is what "with replacement" means). Complements
    * [[weightedSample]] (A-ES, without replacement). Position bias from
    * `% W` is ≤ W / 2^60 — deterministic, not drift. Caller releases
    * storage after its action (the PrefixSum persist contract).
    */
  def weightedSampleReplacement(df: DataFrame, idCol: String,
                                weightCol: String, k: Int,
                                salt: String = "wrsr"): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    val weighted = df.select(col(idCol), col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
    val cum = graft.ops.PrefixSum.exclusiveCumsum(
      weighted, Seq(col(idCol)), col("w"), "start")
    val totalRow = cum.agg(max(col("start") + col("w"))).head()
    if (totalRow.isNullAt(0))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("draw_id",
            org.apache.spark.sql.types.LongType, nullable = false))
          ++ cum.schema.filter(f => f.name == idCol || f.name == "w")))
    val total = totalRow.getLong(0)
    val draws = spark.range(1, k + 1L).select(
      col("id").as("draw_id"),
      (PortableHash.hash60(concat(lit(salt + ":"), col("id").cast("string")))
        % total).as("pos"))
    cum.join(broadcast(draws),
        col("pos") >= col("start") && col("pos") < col("start") + col("w"))
      .select(col("draw_id"), col(idCol), col("w"))
  }

  /** Temperature-scaled stratum resampling — the multilingual
    * alpha-sampling recipe: the kept corpus's stratum shares are
    * ∝ p_s^alpha, flattening a skewed distribution toward balance
    * (alpha = 1 is the natural distribution, alpha → 0 uniform).
    * Downsampling can only REMOVE rows, so rates anchor on the smallest
    * stratum: stratum s keeps the hash-fraction
    * `(n_min / n_s)^(1-alpha)` — the smallest stratum keeps everything
    * and the head is cut hardest (kept_s ∝ n_s^alpha). Callers who
    * cannot afford the head reduction should replicate the tail
    * upstream instead (the [[mixCorpora]] oversampling note).
    *
    * One small count aggregate collects a single row per stratum
    * (bounded by stratum cardinality — languages, domains, sources; for
    * very high-cardinality strata join a broadcast threshold table
    * instead of the literal CASE chain this builds). Keep/drop is the
    * same per-row (salt, id) hash as every sampler here, compared
    * against an INTEGER per-stratum threshold — at alpha = 0.5 the
    * threshold math is sqrt/divide/floor (all correctly-rounded IEEE),
    * so the DuckDB oracle recomputes identical thresholds from the
    * counts and replays the exact sample. Other alphas use pow, whose
    * final ulp may differ across engines — a threshold could then
    * differ by one bucket; membership stays deterministic per engine.
    */
  def temperatureResample(df: DataFrame, idCol: String, stratumCol: String,
                          alpha: Double = 0.5, salt: String = "temp",
                          buckets: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val counts = df.groupBy(col(stratumCol)).count().collect()
      .map(r => r.get(0) -> r.getLong(1)) // one row per stratum
    if (counts.isEmpty) return df.limit(0)
    val nMin = counts.map(_._2).min.toDouble
    def rate(n: Long): Double =
      if (alpha == 0.5) math.sqrt(nMin / n) else math.pow(nMin / n, 1 - alpha)
    val thrCol = counts.foldLeft(lit(0L)) { case (acc, (s, n)) =>
      when(col(stratumCol) <=> lit(s),
        lit(math.floor(buckets * rate(n)).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt, buckets) < thrCol)
  }

  /** Weighted corpus mixture: each source is hash-downsampled to its
    * weight, tagged, and unioned by name — the deterministic version of
    * "mix 30% web, 60% books, 10% code". Rates above 1.0 are rejected
    * (deterministic hashing cannot oversample; replicate the source
    * upstream instead). Per-source salts are derived from the mixture
    * salt, so re-weighting one source never reshuffles another's rows.
    */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)], idCol: String,
                 salt: String = "mix"): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    sources.map { case (name, df, rate) =>
      require(rate > 0 && rate <= 1.0, s"rate for $name must be in (0,1]: $rate")
      sampleFraction(df, idCol, rate, s"$salt:$name")
        .withColumn("corpus", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Per-group quota cap (RefinedWeb-style per-domain limits): keep at
    * most `cap` rows per group, chosen by SALTED-HASH order — an unbiased
    * deterministic draw, not "first by id" (which would bias toward old
    * documents) — with the id as tiebreak so the cut is total. Returns
    * the survivors with their 1-based `rank_in_group`.
    *
    * Scale shape: one hash shuffle on the group key feeding a windowed
    * rank — the exchange is the unavoidable group-by; the hash order
    * means re-running with a larger cap EXTENDS each group's kept set
    * (rank is stable), so caps can be tuned without resampling. A group
    * far larger than a partition (one mega-domain) is the AQE skew-join
    * territory documented at [[graft.ops.SkewJoin]]; caps in practice
    * cut such groups hardest.
    */
  /** Largest-remainder (Hamilton) apportionment of an integer budget
    * across groups, proportional to their row counts: group s gets
    * base_s = ⌊budget·n_s / N⌋, and the L = budget − Σ base leftover
    * units go to the L largest remainders (budget·n_s mod N, ties to
    * the smaller group key — a total order). Σ alloc == budget EXACTLY
    * — the property [[budgetsFor]]'s plain floor cannot give (its
    * truncation under-allocates by up to #groups − 1 units, fine for
    * cost budgets, wrong for seat-style quotas like "exactly N
    * documents in the mix").
    *
    * All arithmetic is exact longs (budget·n_s must fit — at 100 TB
    * group counts, cap budget·max(n_s) < 2⁶³ or pre-scale counts; ANSI
    * overflow enforces, never a silent wrap). Classic Hamilton is
    * uncapped: a group can be allocated more units than it has rows
    * when budget > N — callers sampling WITHIN groups should
    * `least(alloc, n_rows)` and redistribute if that matters.
    *
    * Scale shape: one map-side-combined group count, two single-row
    * aggregates broadcast, one rank window over #groups rows (group
    * cardinality is model-sized by contract — sources/languages/
    * shards, not documents).
    *
    * @return (groupCol, n_rows, alloc) — one row per group
    */
  def largestRemainderAllocation(df: DataFrame, groupCol: String,
                                 budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_rows"))
    val tot = counts.agg(sum(col("n_rows")).as("__t"))
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("__base", graft.functions.IntOps.intDiv(
        col("n_rows") * budget, col("__t")))
      .withColumn("__rem",
        col("n_rows") * budget - col("__base") * col("__t"))
    val leftover = based.agg((lit(budget) - sum(col("__base"))).as("__l"))
    based.crossJoin(broadcast(leftover))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__rem").desc, col(groupCol).asc)).cast("long"))
      .select(col(groupCol), col("n_rows"),
        (col("__base") + when(col("__rk") <= col("__l"), lit(1L))
          .otherwise(lit(0L))).as("alloc"))
  }

  /** Per-source budgets for [[assembleToBudget]]: source s gets
    * ⌊w_s / Σw · totalBudget⌋ cost units. Driver-side Scala arithmetic —
    * the SAME call feeds the oracle-SQL generator, so both engines see
    * identical literal budgets by construction.
    */
  def budgetsFor(weights: Seq[(String, Double)], totalBudget: Long): Seq[(String, Long)] = {
    require(weights.nonEmpty, "need at least one weighted source")
    require(weights.forall(_._2 > 0), "weights must be positive")
    val wsum = weights.map(_._2).sum
    weights.map { case (s, w) => s -> (w / wsum * totalBudget).toLong }
  }

  /** Token/char/byte-budget corpus assembly — "build an N-unit mix at
    * these source weights", the step that turns mixing RATIOS into an
    * actual bounded corpus. Each weighted source draws documents in
    * salted-hash order (the [[capPerGroup]] draw: uniform, deterministic,
    * stable under reruns) and keeps a document while the source's RUNNING
    * cost total — inclusive — still fits its budget (strict fit: the mix
    * may undershoot by less than one document per source, never
    * overshoot). Sources without a weight are excluded.
    *
    * Scale shape: one shuffle by source + a per-source running-sum window
    * (the q97 pattern; cost and hash are the only carried columns). For a
    * corpus dominated by a few whale sources, run those sources through
    * [[graft.ops.PrefixSum]]'s range-partitioned cumulative sum instead
    * of a single-partition window — same arithmetic, no single-task
    * group.
    *
    * @param costCol integer per-document cost (token/char/byte count)
    * @return (idCol, sourceCol, `cum_cost`) for every kept document
    */
  def assembleToBudget(docs: DataFrame, idCol: String, costCol: String,
                       sourceCol: String, weights: Seq[(String, Double)],
                       totalBudget: Long, salt: String = "mix"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budgets = budgetsFor(weights, totalBudget)
    val budgetExpr = budgets.tail.foldLeft(
      when(col(sourceCol) === budgets.head._1, lit(budgets.head._2))) {
      case (acc, (s, b)) => acc.when(col(sourceCol) === s, lit(b))
    }
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(PortableHash.hash60(
        concat(lit(salt + ":"), col(idCol).cast("string"))), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .filter(col(sourceCol).isin(budgets.map(_._1): _*))
      // the never-overshoot/maximal-prefix contract needs a well-defined
      // non-negative cost: a null cost would ride for free (window sums
      // skip nulls) and a negative one makes cum_cost non-monotone, so
      // both are excluded from the draw rather than silently mispriced
      .filter(col(costCol).isNotNull && col(costCol) >= 0)
      .withColumn("cum_cost", sum(col(costCol)).over(w).cast("long"))
      .filter(col("cum_cost") <= budgetExpr)
      .select(col(idCol), col(sourceCol), col("cum_cost"))
  }

  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                  cap: Int, salt: String = "cap"): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(PortableHash.hash60(
        concat(lit(salt + ":"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("rank_in_group", row_number().over(w).cast("long"))
      .filter(col("rank_in_group") <= cap)
  }
}
