package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit — expectation checks as a first-class operator
  * (the dbt-test / Great-Expectations layer of a production pipeline):
  * each rule yields one (check_name, violations) row, so a pipeline can gate
  * a load on `violations == 0` or track data drift over time.
  *
  * Scale shape per rule family:
  *   - row predicates: ALL checks evaluate in ONE corpus scan as
  *     conditional aggregates (`sum(case when violated)`) — no shuffle
  *     beyond the single 1-row aggregate, however many rules ride along;
  *   - uniqueness: violations = rows − distinct keys, one
  *     map-side-combined distinct count;
  *   - referential integrity: a LEFT ANTI count against the parent's
  *     distinct keys — the parent side reduces to its key set before the
  *     join, and a broadcast hint applies when the key set is dim-sized.
  *
  * All counts are exact integers — the DuckDB oracle replays every rule
  * with no tolerance.
  */
object Audit {

  /** Evaluate row-level rules in one scan. Each rule is (name, VIOLATION
    * predicate) — a row where the predicate is true (null predicate
    * results count as violations too: an un-evaluable expectation is not
    * a pass). The report unpivots the single aggregate row to one row per
    * rule through the Column API (an exploded struct array — check names
    * ride as `lit` literals, so a name is DATA, never parsed SQL text: no
    * quote/backslash escaping surface), and the plan is structurally ONE
    * scan — not one reused-exchange copy per rule.
    */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    require(checks.map(_._1).distinct.size == checks.size,
      "check names must be distinct")
    val aggs = checks.zipWithIndex.map { case ((_, violated), i) =>
      sum(when(coalesce(violated, lit(true)), 1L).otherwise(0L)).as(s"__c$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check_name"),
          coalesce(col(s"__c$i"), lit(0L)).as("violations"))
      }: _*)).as("kv"))
      .select(col("kv.check_name").as("check_name"),
        col("kv.violations").as("violations"))
  }

  /** Uniqueness violations on a key: rows beyond the first per key
    * (`n_rows − n_distinct_keys`) — 0 iff the key is unique. The key is
    * counted as a STRUCT, so null key components form real (countable)
    * key values — two (null, 1) rows are one duplicate, exactly like
    * SQL's `count(DISTINCT (a, b))` (a bare multi-column countDistinct
    * would skip null-keyed rows and over-report).
    */
  def uniqueness(df: DataFrame, keyCols: Seq[String], name: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    df.agg(count(lit(1)).as("__n"),
        countDistinct(struct(keyCols.map(col): _*)).as("__d"))
      .select(lit(name).as("check_name"), (col("__n") - col("__d")).as("violations"))
  }

  /** Referential-integrity violations: child rows whose key has no match
    * in the parent (null child keys violate too — an unresolvable
    * reference). Parent reduces to its distinct key set first.
    *
    * `broadcastParent` defaults FALSE: the safe default for a
    * parent of unknown size is a shuffled anti-join (AQE still upgrades
    * it to broadcast when the collected key set proves small). Pass true
    * only when the parent's distinct key set is known dim-sized — a
    * fact-sized parent's key set would blow the driver/broadcast limit.
    */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String, broadcastParent: Boolean = false): DataFrame = {
    val keys0 = parent.select(col(parentKey).as("__pk")).distinct()
    val keys = if (broadcastParent) broadcast(keys0) else keys0
    child.select(col(childKey).as("__ck"))
      .join(keys, col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))
  }

  /** Assemble a report from rule-family frames (each (check_name, violations)). */
  def report(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "at least one part")
    parts.reduce(_ unionAll _)
  }

  /** Cohen's kappa per group — chance-corrected inter-annotator agreement
    * (Cohen 1960), the label-quality metric raw percent-agreement
    * overstates whenever the class mix is skewed (two raters who both say
    * "keep" 90% of the time agree 82% by luck alone). One row per group:
    * n, agree (diagonal count), chance (the Σ_k rowTotal_k·colTotal_k
    * chance-agreement numerator), and
    * kappa_ppm = ⌊10⁶·(n·agree − chance) / (n² − chance)⌋ — every term an
    * exact integer, and the division truncates toward zero in BOTH engines
    * (Spark IntegralDivide ≡ DuckDB `//`, probed on negatives: −7//2 = −3),
    * so even a negative kappa (systematic disagreement) hash-gates.
    * kappa_ppm is null when n² = chance (both raters constant — agreement
    * is undefined, not perfect). A null rating is its own class: two
    * raters who both abstain agree.
    *
    * Scale shape: ONE map-side-combined shuffle builds the
    * (group, a, b) contingency table; everything after runs on
    * groups·classes² rows. Long arithmetic is exact while 10⁶·n² < 2⁶³,
    * i.e. group sizes up to ~3.0M items — agreement audits run on labeled
    * samples, which sit orders of magnitude below that bound.
    */
  def cohenKappa(df: DataFrame, groupCols: Seq[String],
                 raterA: Column, raterB: Column): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val g = groupCols.map(col)
    val cont = df.groupBy((g :+ raterA.as("__a") :+ raterB.as("__b")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val tot = cont.groupBy(g: _*).agg(
      sum(col("__cnt")).as("n"),
      sum(when(col("__a") <=> col("__b"), col("__cnt")).otherwise(0L)).as("agree"))
    val ra = cont.groupBy((g :+ col("__a").as("__k")): _*)
      .agg(sum(col("__cnt")).as("__ak"))
    val rb = cont.groupBy((g :+ col("__b").as("__k")): _*)
      .agg(sum(col("__cnt")).as("__bk"))
    // null-safe joins: a null CLASS is a real rating category (abstain) and
    // a null GROUP key is a real group — equi-joins would drop both
    val chCond = (groupCols.map(c => ra(c) <=> rb(c)) :+ (ra("__k") <=> rb("__k")))
      .reduce(_ && _)
    val ch = ra.join(rb, chCond)
      .groupBy(groupCols.map(ra(_)): _*)
      .agg(sum(col("__ak") * col("__bk")).as("chance"))
    val outCond = groupCols.map(c => tot(c) <=> ch(c)).reduce(_ && _)
    tot.join(ch, outCond, "left")
      .select((groupCols.map(tot(_)) :+ col("n") :+ col("agree") :+
        coalesce(col("chance"), lit(0L)).as("chance")): _*)
      .withColumn("kappa_ppm",
        when(col("n") * col("n") === col("chance"), lit(null).cast("long"))
          .otherwise(graft.functions.IntOps.intDiv(
            lit(1000000L) * (col("n") * col("agree") - col("chance")),
            col("n") * col("n") - col("chance"))))
  }

  /** Fleiss' kappa per group — [[cohenKappa]]'s n-rater generalization
    * (Fleiss 1971): chance-corrected agreement when EVERY item carries the
    * same fixed panel of raters (the labeled-sample audit where three
    * heuristic annotators vote on every document). All terms exact
    * integers, derived without ever materializing the per-item×category
    * table:
    *
    *   - per item, Σ_j n_ij² − n = 2·(agreeing rater PAIRS) — a row-local
    *     expression (r·(r−1)/2 comparisons), summed map-side;
    *   - per category, c_j = Σ_k count(rater_k = j) — ONE shuffle over the
    *     exploded (group, category) pairs;
    *   - κ = (A·Nr − (r−1)·C) / ((r−1)·((Nr)² − C)) with A = ΣΣn_ij² − Nr,
    *     C = Σ_j c_j² — the P̄o/P̄e definition cross-multiplied and reduced
    *     by the common Nr factor, so the widest product is 10⁶·(r−1)·(Nr)²:
    *     exact in longs for groups up to ~0.6M items at r = 3.
    *
    * kappa_ppm truncates toward zero in both engines (the q251
    * IntegralDivide ≡ `//` probe) and is null when (Nr)² = C — every
    * rating in the group identical, agreement undefined. A null rating is
    * a real category (two abstaining raters agree), compared null-safely
    * throughout.
    */
  def fleissKappa(df: DataFrame, groupCols: Seq[String],
                  raters: Seq[Column]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(raters.size >= 2, "at least two raters")
    val g = groupCols.map(col)
    val r = lit(raters.size.toLong)
    val agreePairsRow = raters.combinations(2).map { case Seq(a, b) =>
      when(a <=> b, 1L).otherwise(0L)
    }.reduce(_ + _)
    val tot = df.groupBy(g: _*).agg(
      count(lit(1)).as("n"),
      sum(agreePairsRow).as("agree_pairs"))
    val cj = df.select((g :+ explode(array(raters: _*)).as("__cat")): _*)
      .groupBy((g :+ col("__cat")): _*)
      .agg(count(lit(1)).as("__cj"))
      .groupBy(g: _*)
      .agg(sum(col("__cj") * col("__cj")).as("chance"))
    val outCond = groupCols.map(c => tot(c) <=> cj(c)).reduce(_ && _)
    val nr = col("n") * r
    tot.join(cj, outCond, "left")
      .select((groupCols.map(tot(_)) :+ col("n") :+ col("agree_pairs") :+
        coalesce(col("chance"), lit(0L)).as("chance")): _*)
      .withColumn("kappa_ppm",
        when(nr * nr === col("chance"), lit(null).cast("long"))
          .otherwise(graft.functions.IntOps.intDiv(
            lit(1000000L) * (lit(2L) * col("agree_pairs") * nr -
              (r - lit(1L)) * col("chance")),
            (r - lit(1L)) * (nr * nr - col("chance")))))
  }

  /** Majority-vote consensus labels plus per-annotator accuracy — the
    * aggregation step every labeling pipeline runs before training
    * (Dawid–Skene's iteration zero): each item's consensus is the
    * category most of its raters chose, ties broken toward the SMALLEST
    * category (a stated total order, so the consensus is deterministic
    * and oracle-replayable), and each rater is scored by how often they
    * match it — the per-annotator quality signal that decides whose
    * labels to down-weight. All integers; acc_ppm is one floor division.
    *
    * Returns one row per (group, rater): (groupCols…, rater, n, n_match,
    * acc_ppm). A null rating is a real category (matches a null
    * consensus). `idCol` must identify items uniquely. Scale shape: one
    * explode to raters·items rows, a per-item count (map-side combined —
    * the per-item key is high-cardinality), one window over ≤ categories
    * rows per item, and a broadcast-sized final report.
    */
  def majorityVote(df: DataFrame, idCol: String, groupCols: Seq[String],
                   raters: Seq[(String, Column)]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(raters.size >= 2, "at least two raters")
    require(raters.map(_._1).distinct.size == raters.size,
      "rater names must be distinct")
    val g = groupCols.map(col)
    val votes = df.select((col(idCol).as("__id") +: g) :+
        explode(array(raters.map { case (name, c) =>
          struct(lit(name).as("rater"), c.as("__cat"))
        }: _*)).as("__v"): _*)
      .select((col("__id") +: g) :+ col("__v.rater").as("rater") :+
        col("__v.__cat").as("__cat"): _*)
    val cnt = votes.groupBy(col("__id"), col("__cat"))
      .agg(count(lit(1)).as("__n"))
    val maj = cnt.withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__id"))
          .orderBy(col("__n").desc, col("__cat").asc_nulls_first)))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__cat").as("__maj"))
    votes.join(maj, Seq("__id"))
      .groupBy((g :+ col("rater")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__cat") <=> col("__maj"), 1L).otherwise(0L)).as("n_match"))
      .withColumn("acc_ppm", graft.functions.IntOps.intDiv(
        lit(1000000L) * col("n_match"), col("n")))
  }
}
