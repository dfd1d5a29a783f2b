package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental embedding-near-dup contract, mirroring
  * IncrementalDedupSpec: batch-vs-store pairs match a full-corpus LSH run,
  * and the store side of the cross-generation join plans WITHOUT an
  * Exchange — per-ingest cost stays O(batch).
  */
class IncrementalAnnSpec extends AnyFunSuite with SparkSpec {

  private val storeTable = "graft_tst_emb_store"
  private val dim = 4

  private def embDf(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def bucketed(rows: Seq[(Long, Seq[Double])]) =
    IncrementalAnn.bucketedEmbeddings(embDf(rows), "vec_id", "embedding",
      nPlanes = 4, nTables = 2, dim = dim)

  private val vBase = Seq(1.0, 0.2, -0.3, 0.5)
  private val vNear = Seq(0.95, 0.25, -0.28, 0.52) // high cosine vs vBase
  private val vFar = Seq(-0.9, 0.8, 0.7, -0.6)     // negative cosine vs vBase

  test("cross-generation pairs find near-dups across batches; union matches full-corpus LSH") {
    dropTable(storeTable)
    IncrementalAnn.appendToStore(bucketed(Seq(1L -> vBase, 2L -> vFar)),
      storeTable, buckets = 4)
    val batch = bucketed(Seq(10L -> vNear, 11L -> vFar.map(-_)))
    val pairs = IncrementalAnn.ingestNearDups(spark, storeTable, batch, minCosine = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(pairs.exists { case (a, b, c) => a == 1L && b == 10L && c > 0.9 },
      s"(1,10) must surface with high cosine, got ${pairs.toSeq}")
    assert(pairs.exists { case (a, b, _) => a == 2L && b == 11L } == false,
      "opposite vectors must not pair at minCosine=0.8")

    val full = Dedup.embeddingNearDupsLsh(
      embDf(Seq(1L -> vBase, 2L -> vFar, 10L -> vNear, 11L -> vFar.map(-_))),
      "vec_id", "embedding", minCosine = 0.8, nPlanes = 4, nTables = 2, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchIds = Set(10L, 11L)
    val fullBatchPairs = full.filter(p => batchIds(p._1) || batchIds(p._2))
    assert(fullBatchPairs == pairs.map(p => (p._1, p._2)).toSet,
      s"incremental must find exactly the full-corpus pairs involving the batch: full=$fullBatchPairs")
    graft.Storage.releaseAll(spark)
  }

  test("the store side of the cross-generation join plans with NO Exchange (batch side only)") {
    dropTable(storeTable)
    IncrementalAnn.appendToStore(bucketed(Seq(1L -> vBase)), storeTable, buckets = 4)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = IncrementalAnn.crossGenerationPairs(
        spark.table(storeTable), bucketed(Seq(20L -> vNear)), minCosine = 0.5)
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"exactly ONE Exchange (the batch side); the bucketed store must not shuffle:\n${plan.take(2000)}")
      assert(joined.collect().nonEmpty, "the near vector must hit the store")
    }
    graft.Storage.releaseAll(spark)
  }

  test("storePairs self-join is bucket-aligned: the only exchange is the pair distinct") {
    dropTable(storeTable)
    IncrementalAnn.appendToStore(
      bucketed(Seq(1L -> vBase, 2L -> vNear, 3L -> vFar)), storeTable, buckets = 4)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val pairs = IncrementalAnn.storePairs(spark.table(storeTable), minCosine = 0.5)
      val plan = pairs.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected 1 exchange (the distinct); neither store scan may shuffle:\n${plan.take(2000)}")
      assert(pairs.collect().exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
        "the near pair must surface from the store")
    }
    graft.Storage.releaseAll(spark)
  }

  test("compaction preserves results and the exchange-free store-side plan") {
    dropTable(storeTable)
    dropTable(storeTable + "__compacting")
    IncrementalAnn.appendToStore(bucketed(Seq(1L -> vBase)), storeTable, buckets = 4)
    IncrementalAnn.appendToStore(bucketed(Seq(2L -> vFar)), storeTable, buckets = 4)
    val batch = bucketed(Seq(20L -> vNear))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    def canon() = IncrementalAnn.ingestNearDups(spark, storeTable, batch, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = canon()
    assert(before.nonEmpty)

    IncrementalAnn.compactStore(spark, storeTable)

    assert(canon() == before, "pairs must be bit-identical across compaction")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = IncrementalAnn.crossGenerationPairs(
        spark.table(storeTable), batch, minCosine = 0.5)
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(joined.queryExecution.executedPlan.toString).length
      assert(exchanges == 1, "bucket spec must survive compaction")
    }
    graft.Storage.releaseAll(spark)
  }
}
