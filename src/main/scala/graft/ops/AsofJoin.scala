package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: attach to each left row the latest right row whose
  * timestamp is ≤ the left row's, per key — the standard event/panel
  * enrichment the reference lacks (SURVEY §2.5: no as-of joins) and a core
  * operator for event-time analytics at scale.
  *
  * Spark-first composition instead of a custom SparkPlan (preference (a) in
  * the build brief): tag and union both sides, then one running
  * `last(_, ignoreNulls)` window per value column. Exactly ONE shuffle on
  * the key columns — the same cost as the sort-merge as-of a native engine
  * would run — and whole-stage-codegen-friendly throughout. Ties (right and
  * left rows at the same timestamp) resolve as right-before-left, matching
  * the inclusive `left.ts >= right.ts` convention.
  */
object AsofJoin {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` get attached)
    * @param keyCols   equi-join keys
    * @param tsCol     event-time column name (present on both sides)
    * @param valueCols right columns to carry; must not clash with left names
    * @param rightTieCols right columns breaking ties among right rows that
    *                  share a timestamp: the row with the HIGHEST tie tuple
    *                  wins. Without one, which of several equal-ts right
    *                  rows is attached is partition-order-dependent — fine
    *                  when the right key (key, ts) is unique, a
    *                  nondeterminism hazard otherwise (pass the right
    *                  side's unique id).
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, valueCols: Seq[String],
               rightTieCols: Seq[String] = Nil): DataFrame = {
    val clash = valueCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"valueCols clash with left columns: $clash")

    val l = left.withColumn("__side", lit(1))
    // the whole right row travels as one struct: the struct itself is the
    // non-null "a right row exists here" marker, so right values that are
    // genuinely null still win over older rows (exact as-of semantics)
    val tieNames = rightTieCols.indices.map(i => s"__tie$i")
    val r = right
      .select((keyCols :+ tsCol).map(col)
        ++ rightTieCols.zip(tieNames).map { case (c, n) => col(c).as(n) }
        :+ struct(valueCols.map(col): _*).as("__rv"): _*)
      .withColumn("__side", lit(0))
    val unioned = Relational.unionByNameFill(Seq(l, r))

    // order: ts, then right-before-left at equal ts, then the tie tuple
    // ascending so `last` picks the highest (left rows carry null ties and
    // are already separated by __side)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol) +: col("__side") +: tieNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))

    val unpacked = valueCols.foldLeft(filled)((d, c) => d.withColumn(c, col("__rv")(c)))
    unpacked.filter(col("__side") === 1).drop("__side" +: "__rv" +: tieNames: _*)
  }
}
