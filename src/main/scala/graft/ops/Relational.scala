package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operator kit re-expressing the reference pipeline's
  * core table operations Spark-first (SURVEY.md §2, §7 stage 3).
  *
  * Every helper returns a lazy [[DataFrame]]/[[Column]] so Catalyst can fuse,
  * push down, and prune across operator boundaries; none of them collect to
  * the driver. All are shuffle-aware: window-based helpers declare explicit
  * partition keys so a 1000-executor cluster partitions by the same keys the
  * single-node reference implicitly assumed.
  */
object Relational {

  /** U1 — union frames by column name, null-filling columns absent on one
    * side. Mirrors `rbindlist(fill=TRUE, use.names=TRUE)` /
    * `pd.concat(ignore_index=True)` (reference:
    * scripts/wait-times/build_datasets_wait_times.R:413-414,
    * scripts/build_datasets_main.py:155).
    */
  def unionByNameFill(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionByNameFill: empty input")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** P6 — snake_case column-name cleaning, the `janitor::make_clean_names`
    * analog (reference: scripts/wait-times/build_datasets_wait_times.R:136).
    * Pure driver-side rename: zero cost in the executed plan.
    */
  def cleanName(s: String): String = {
    val base = s.trim
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    if (base.isEmpty) "x" else if (base.head.isDigit) "x" + base else base
  }

  def cleanNames(df: DataFrame): DataFrame = {
    val cleaned = df.columns.map(cleanName)
    // janitor-style disambiguation of collisions: a, a_2, a_3 ...
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val unique = cleaned.map { c =>
      val n = seen.getOrElse(c, 0) + 1
      seen(c) = n
      if (n == 1) c else s"${c}_$n"
    }
    df.toDF(unique.toIndexedSeq: _*)
  }

  /** P5 — bulk rename to a canonical schema, tolerant of absent columns
    * (`setnames(..., skip_absent=TRUE)`, reference:
    * scripts/wait-times/build_datasets_wait_times.R:139-173).
    */
  def renameTolerant(df: DataFrame, renames: Map[String, String]): DataFrame = {
    val present = renames.filter { case (from, _) => df.columns.contains(from) }
    df.withColumnsRenamed(present)
  }

  /** P5, order-sensitive variant: the reference's `setnames` blocks apply
    * SEQUENTIALLY, and some chains depend on it (wait-times jan07:
    * `provider → provider_name` must run before `provider_name → org_name`
    * so a file with a `provider` column ends at `org_name`). Each step is
    * tolerant of an absent source column.
    */
  def renameSeq(df: DataFrame, renames: Seq[(String, String)]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** U5 — coalesce groups of alternative columns into one canonical column
    * (`combine_first` reduce, reference:
    * scripts/build_datasets_main.py:165-196,325-335). Missing members of a
    * group are skipped; the group's source columns are dropped.
    */
  def coalesceGroups(df: DataFrame, groups: Map[String, Seq[String]]): DataFrame =
    groups.foldLeft(df) { case (d, (target, sources)) =>
      val present = sources.filter(d.columns.contains)
      require(present.nonEmpty, s"coalesceGroups: no source column for $target")
      d.withColumn(target, coalesce(present.map(col): _*))
        .drop(present.filterNot(_ == target): _*)
    }

  /** §1.4 — NaN/Inf-free ratio. The reference computes `x/y` then maps
    * `0/0 → NaN → NA` and `x/0 → Inf → NA`
    * (scripts/available-and-occupied-beds/build_datasets_overnight_day_beds.R:152-156,537).
    * Spark double division yields NaN/Infinity, so normalise to null in one
    * codegen-friendly expression.
    */
  def safeDiv(num: Column, den: Column): Column =
    when(den.isNull || den === 0d || num.isNull, lit(null)).otherwise(num / den)

  /** A1 — grouped NA-preserving sum: null iff all inputs in the group are
    * null (`ifelse(all(is.na(.)), NA, sum(., na.rm=TRUE))`, reference:
    * scripts/wait-times/build_datasets_wait_times.R:503-505). Spark's `sum`
    * has exactly this semantics (partial map-side aggregation included);
    * pinned by OpsSpec so a regression in that assumption is caught.
    */
  def naPreservingSum(cols: Seq[String]): Seq[Column] =
    cols.map(c => sum(col(c)).as(c))

  /** A3 — deterministic first-row-per-group (`group_by |> slice(1)`,
    * reference: scripts/wait-times/build_datasets_wait_times.R:449-453).
    * The reference relies on encounter order; Spark frames are unordered so
    * the caller supplies an explicit total order (SURVEY §7 hard part 1).
    */
  def firstPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A5 — group-wide any() flag broadcast back to every row
    * (`ifelse(any(flag==1),1,0)`, reference:
    * scripts/available-and-occupied-beds/build_datasets_overnight_day_beds.R:554-555).
    * Window-max avoids a join; one shuffle on the group keys.
    */
  def groupAnyFlag(df: DataFrame, keys: Seq[String], flag: Column, out: String): DataFrame =
    df.withColumn(out, max(flag).over(Window.partitionBy(keys.map(col): _*)))

  /** A4 — group max broadcast back to rows (`mutate(change_date = max(date))`,
    * reference: scripts/wait-times/build_datasets_wait_times.R:487-491).
    */
  def groupMax(df: DataFrame, keys: Seq[String], value: Column, out: String): DataFrame =
    df.withColumn(out, max(value).over(Window.partitionBy(keys.map(col): _*)))

  /** F2/§1.4 — map sentinel markers ('-', '', 'NULL', 'NA', ...) to real
    * nulls on read (reference: scripts/wait-times/build_datasets_wait_times.R:69,
    * scripts/build_datasets_main.py:100-104).
    */
  def nullifySentinels(c: Column, sentinels: Seq[String] = Seq("-", "", "NULL", "NA", "N/A")): Column =
    when(trim(c).isin(sentinels: _*), lit(null)).otherwise(c)

  /** P3 — drop columns that are entirely null: a data-dependent projection
    * (`select(where(~!all(is.na(.))))`, reference:
    * scripts/critical-care-beds/build_datasets_critical_care_beds.R:172-174).
    * One aggregate pass counting non-nulls per column, then a driver-side
    * drop — the only driver involvement is the single counts row.
    */
  def dropAllNullCols(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.map(c => count(col(c)).as(c)).toIndexedSeq: _*).head()
    val dead = df.columns.filter(c => counts.getAs[Long](c) == 0L)
    df.drop(dead: _*)
  }

  /** U6 — swap two columns' values where a predicate holds (clean splits
    * re-coded as backwards mergers, reference:
    * scripts/org-changes/build_trust_lookup.R:104-107).
    */
  def swapWhere(df: DataFrame, pred: Column, a: String, b: String): DataFrame =
    df.withColumns(Map(
      a -> when(pred, col(b)).otherwise(col(a)),
      b -> when(pred, col(a)).otherwise(col(b))))

  /** Skew-safe two-stage aggregation: salt the grouping key so one hot key
    * spreads over `buckets` reducers, partially aggregate, then strip the
    * salt and finish. For sums/counts the result is exactly the direct
    * aggregation (associative re-combination); use when a handful of keys
    * dominate and AQE's skew handling can't help (it only splits join
    * partitions, not aggregation groups). Hash-aggregation already combines
    * map-side, so reach for this only when the per-key *reduce* state is the
    * bottleneck (e.g. huge countDistinct-style groups).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
