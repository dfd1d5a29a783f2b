package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental KMV store invariants: any append/compact history yields
  * BIT-IDENTICAL estimates to the one-shot sketch (bottom-k is a pure
  * set function), compaction folds to one row per group under the same
  * bucket spec, the read-time merge plans with zero Exchange on the
  * bucketed store, and ingest writes only batch-sized data. The
  * independent end-to-end checks are the q129/q130 oracles — one-shot
  * rank-window SQL that never heard of the incremental mechanics.
  */
class IncrementalKmvSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val k = 16
  // 3 groups × values with controlled overlap; > k distinct per group so
  // the estimator path (not the exact-below-k path) is exercised too
  private lazy val rows: Seq[(String, String)] =
    (0 until 400).map(i => ("g" + (i % 3), "v" + (i % 97))) ++
      (0 until 50).map(i => ("g0", "only0_" + i))
  private lazy val df = rows.toDF("grp", "value")

  private def oneShot = KmvSketch
    .distinctByGroup(df, Seq("grp"), "value", k)
    .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def storeEstimates(table: String) = IncrementalKmv
    .distinctFromStore(spark, table, "grp", k)
    .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def buildStore(table: String, splits: Int): Unit = {
    IncrementalKmv.dropStore(spark, table)
    for (g <- 0 until splits) {
      val batch = df.filter(pmod(hash(col("value")), lit(splits)) === g)
      IncrementalKmv.appendToStore(
        IncrementalKmv.sketchBatch(batch, "grp", "value", k),
        table, "grp", buckets = 4)
    }
  }

  test("batched store estimates are bit-identical to the one-shot sketch, " +
      "for different batch splits") {
    for (splits <- Seq(2, 5)) {
      val t = s"graft_kmv_spec_$splits"
      buildStore(t, splits)
      assert(storeEstimates(t) == oneShot, s"splits=$splits")
      dropTable(t)
    }
  }

  test("compaction folds to one row per group, preserves the bucket spec, " +
      "and does not move estimates") {
    val t = "graft_kmv_spec_compact"
    buildStore(t, 3)
    val before = storeEstimates(t)
    val rowsBefore = spark.table(t).count()
    IncrementalKmv.compactStore(spark, t, "grp", k)
    assert(spark.table(t).count() == 3L && rowsBefore > 3L)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t))
    assert(meta.bucketSpec.exists(s =>
      s.numBuckets == 4 && s.bucketColumnNames == Seq("grp")))
    assert(storeEstimates(t) == before)
    // further ingest after compaction still composes
    IncrementalKmv.appendToStore(
      IncrementalKmv.sketchBatch(
        Seq(("g1", "fresh1"), ("g1", "fresh2")).toDF("grp", "value"),
        "grp", "value", k), t, "grp", buckets = 4)
    val merged = IncrementalKmv.mergedSketches(spark, t, "grp", k)
    val direct = KmvSketch.distinctByGroup(
      df.union(Seq(("g1", "fresh1"), ("g1", "fresh2")).toDF("grp", "value")),
      Seq("grp"), "value", k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(storeEstimates(t) == direct)
    assert(merged.count() == 3L)
    dropTable(t)
  }

  test("read-time merge plans with zero Exchange on the bucketed store") {
    val t = "graft_kmv_spec_plan"
    buildStore(t, 2)
    val p = IncrementalKmv.mergedSketches(spark, t, "grp", k)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1500))
    dropTable(t)
  }

  test("intersection from the store equals the one-shot intersection matrix") {
    val t = "graft_kmv_spec_inter"
    buildStore(t, 3)
    val fromStore = IncrementalKmv.intersectionFromStore(spark, t, "grp", k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val oneShotM = KmvSketch.intersectionMatrix(df, "grp", "value", k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(fromStore == oneShotM && fromStore.nonEmpty)
    dropTable(t)
  }
}
