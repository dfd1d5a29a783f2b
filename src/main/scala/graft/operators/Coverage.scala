package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection — pick the k documents whose token
  * union is (approximately) largest. Coverage is submodular, so the
  * greedy sweep carries the classic (1 − 1/e) guarantee (Nemhauser,
  * Wolsey & Fisher 1978) and is the standard diverse-subset move in
  * corpus curation: a seed set that SEES the most vocabulary, not the k
  * longest near-identical documents.
  *
  * Scale shape: k passes over the (doc, token) incidence table, each ONE
  * anti-join against the covered set plus one map-side-combined count and
  * a TakeOrdered(1) winner draw. The covered set lives on the driver and
  * is bounded by construction — k docs × tokens-per-doc (k is small by
  * the operator's own definition; a thousand-token budget is kilobytes) —
  * and re-enters the plan as a BROADCAST anti-join, so no round ever
  * shuffles on the accumulated state. Ties break to the LOWEST doc id
  * (total order ⇒ the selection replays exactly); selection stops early
  * once no document covers any uncovered token.
  */
object Coverage {

  /** @param tokensCol array-of-string column (duplicates tolerated — the
    *                  incidence table is distinct)
    * @return (round 1..k, doc_id, gain) — gain is the count of FIRST-TIME
    *         tokens the round's winner contributed; gains are
    *         non-increasing (submodularity), pinned in CoverageSpec
    */
  def greedyMaxCoverage(df: DataFrame, idCol: String, tokensCol: Column,
                        k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val idType = df.schema(idCol).dataType
    val elems = df
      .select(col(idCol).as("__id"), explode(tokensCol).as("__tok"))
      .distinct()
      .persist()
    try {
      elems.count()
      val covered = scala.collection.mutable.HashSet.empty[String]
      val picks = scala.collection.mutable.Buffer.empty[Row]
      var r = 1
      var exhausted = false
      while (r <= k && !exhausted) {
        val uncovered =
          if (covered.isEmpty) elems
          else elems.join(
            broadcast(covered.toSeq.toDF("__tok")), Seq("__tok"), "left_anti")
        val winner = uncovered.groupBy(col("__id"))
          .agg(count(lit(1)).as("__gain"))
          .orderBy(col("__gain").desc, col("__id"))
          .limit(1).collect()
        if (winner.isEmpty) exhausted = true
        else {
          val id = winner.head.get(0)
          val gain = winner.head.getLong(1)
          picks += Row(r.toLong, id, gain)
          covered ++= elems.filter(col("__id") === lit(id))
            .select(col("__tok")).as[String].collect()
          r += 1
        }
      }
      spark.createDataFrame(
        java.util.Arrays.asList(picks.toSeq: _*),
        StructType(Seq(
          StructField("round", LongType, nullable = false),
          StructField("doc_id", idType),
          StructField("gain", LongType, nullable = false))))
    } finally elems.unpersist()
  }
}
