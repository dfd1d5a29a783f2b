package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental aggregate-view invariants: any append/compact history
  * equals the one-shot aggregate (sums commute), compaction folds to
  * one row per group under the same bucket spec and composes with
  * further ingest, and the merged read plans with zero Exchange on the
  * bucketed store. Independent end-to-end check: the q155 oracle (the
  * plain one-shot GROUP BY).
  */
class IncrementalAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val rows = (0 until 300)
    .map(i => (i.toLong, "g" + (i % 4), (i % 7).toLong))
  private lazy val df = rows.toDF("id", "grp", "v")

  private def oneShot = df.groupBy(col("grp"))
    .agg(sum(lit(1L)).cast("long").as("n"), sum(col("v")).cast("long").as("sv"))
    .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def fromStore(t: String) = IncrementalAgg
    .merged(spark, t, Seq("grp"), Seq("n", "sv"))
    .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def build(t: String, splits: Int, compactAt: Set[Int]): Unit = {
    IncrementalKmv.dropStore(spark, t)
    for (g <- 0 until splits) {
      val batch = df.filter(pmod(col("id"), lit(splits)) === g)
      IncrementalAgg.appendToStore(
        IncrementalAgg.partials(batch, Seq("grp"),
          Seq("n" -> lit(1L), "sv" -> col("v"))),
        t, Seq("grp"), buckets = 4)
      if (compactAt.contains(g))
        IncrementalAgg.compactStore(spark, t, Seq("grp"), Seq("n", "sv"))
    }
  }

  test("any append/compact history equals the one-shot aggregate") {
    for ((splits, compacts) <- Seq((2, Set.empty[Int]), (5, Set(1, 3)))) {
      val t = s"graft_ivm_${splits}_${compacts.size}"
      build(t, splits, compacts)
      assert(fromStore(t) == oneShot, s"splits=$splits compacts=$compacts")
      dropTable(t)
    }
  }

  test("compaction folds to one row per group, preserves the bucket spec") {
    val t = "graft_ivm_compact"
    build(t, 3, Set.empty)
    assert(spark.table(t).count() > 4L)
    IncrementalAgg.compactStore(spark, t, Seq("grp"), Seq("n", "sv"))
    assert(spark.table(t).count() == 4L)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t))
    assert(meta.bucketSpec.exists(s =>
      s.numBuckets == 4 && s.bucketColumnNames == Seq("grp")))
    assert(fromStore(t) == oneShot)
    dropTable(t)
  }

  test("merged read plans with zero Exchange on the bucketed store") {
    val t = "graft_ivm_plan"
    build(t, 2, Set.empty)
    val p = IncrementalAgg.merged(spark, t, Seq("grp"), Seq("n", "sv"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1200))
    dropTable(t)
  }
}
