package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrefixSumSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random rows: (id, value) with values that vary in
  // magnitude, shuffled order (hash of id) so input order ≠ scan order.
  private def data(n: Int) =
    (1 to n).map(i => (i.toLong, ((i * 2654435761L) % 97 + 1))).toDF("id", "v")

  private def naive(n: Int): Map[Long, Long] = {
    val rows = (1 to n).map(i => (i.toLong, (i * 2654435761L) % 97 + 1))
    rows.sortBy(_._1).scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
      .sliding(2).map { case Seq((_, acc), (id, _)) => id -> acc }.toMap
  }

  test("exclusiveCumsum equals the single-window cumsum at every partition count") {
    for (np <- Seq(1, 3, 8)) {
      val got = PrefixSum.exclusiveCumsum(data(200), Seq(col("id")), col("v"),
          "cum", numPartitions = np)
        .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
      assert(got == naive(200), s"np=$np")
      graft.Storage.releaseAll(spark)
    }
  }

  test("the scan never plans a single-partition exchange (the naive shape does)") {
    val scalable = PrefixSum.exclusiveCumsum(data(50), Seq(col("id")), col("v"),
      "cum", numPartitions = 4)
    val plan = scalable.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    // the range shuffle is the ONLY full-data exchange: the per-partition
    // scan replaced the Window.partitionBy(__pid) that used to hash-shuffle
    // the whole dataset a second time
    assert(!plan.toLowerCase.contains("hashpartitioning"), plan)
    val naivePlan = data(50)
      .withColumn("cum", sum(col("v")).over(
        Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("SinglePartition"), naivePlan)
    graft.Storage.releaseAll(spark)
  }

  test("runningMax equals the per-group window max at every partition count") {
    val df = (1 to 300).map { i =>
      (s"g${i % 4}", i.toLong, ((i * 40503L) % 89) - 11) }.toDF("g", "id", "v")
    val expect = df.withColumn("rm", max(col("v")).over(
        Window.partitionBy(col("g")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("g"), col("id"), col("rm")).as[(String, Long, Long)]
      .collect().map { case (g, id, rm) => (g, id) -> rm }.toMap
    for (np <- Seq(1, 3, 8)) {
      val got = PrefixSum.runningMax(df, Seq("g"), Seq(col("id")), col("v"),
          "rm", numPartitions = np)
        .select(col("g"), col("id"), col("rm")).as[(String, Long, Long)]
        .collect().map { case (g, id, rm) => (g, id) -> rm }.toMap
      assert(got == expect, s"np=$np")
      graft.Storage.releaseAll(spark)
    }
  }

  test("runningMax skips nulls and plans no per-group single-task sort") {
    val df = Seq(("a", 1L, None: Option[Long]), ("a", 2L, Some(5L)),
      ("a", 3L, None: Option[Long]), ("a", 4L, Some(3L)),
      ("b", 1L, None: Option[Long])).toDF("g", "id", "v")
    val out = PrefixSum.runningMax(df, Seq("g"), Seq(col("id")), col("v"), "rm",
        numPartitions = 3)
      .select(col("g"), col("id"), col("rm")).as[(String, Long, Option[Long])]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(out == Map(("a", 1L) -> None, ("a", 2L) -> Some(5L),
      ("a", 3L) -> Some(5L), ("a", 4L) -> Some(5L), ("b", 1L) -> None))
    graft.Storage.releaseAll(spark)
    val plan = PrefixSum.runningMax(df, Seq("g"), Seq(col("id")), col("v"), "rm",
      numPartitions = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(!plan.contains("Window"), plan)
    graft.Storage.releaseAll(spark)
  }

  test("packSequences lays the token stream contiguously and bins consistently") {
    val docs = (1 to 120).map(i => (i.toLong, (i % 13) * 7 + 3)).toDF("doc_id", "n_tokens")
    val packed = PrefixSum.packSequences(docs, "doc_id", "n_tokens",
        binTokens = 64, numPartitions = 4)
      .select(col("doc_id"), col("n_tokens").cast("long"), col("start_offset"),
        col("bin_first"), col("bin_last"), col("n_bins"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._3)
    // contiguous: each start is the previous start + previous length
    assert(packed.head._3 == 0L)
    packed.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2, s"gap between ${a._1} and ${b._1}")
    case _ => ()
    }
    // bins: floor arithmetic and span count agree
    packed.foreach { case (_, n, off, bf, bl, nb) =>
      assert(bf == off / 64)
      assert(bl == (off + n - 1) / 64)
      assert(nb == bl - bf + 1)
    }
    // the final bin index covers the whole stream
    val total = packed.map(_._2).sum
    assert(packed.map(_._5).max == (total - 1) / 64)
    graft.Storage.releaseAll(spark)
  }

  test("packSequences drops token-less rows and is insensitive to input partitioning") {
    val docs = Seq((1L, 5L), (2L, 0L), (3L, 7L)).toDF("doc_id", "n_tokens")
    val a = PrefixSum.packSequences(docs, "doc_id", "n_tokens", 16)
      .select(col("doc_id"), col("start_offset")).as[(Long, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    val b = PrefixSum.packSequences(docs.repartition(7), "doc_id", "n_tokens", 16)
      .select(col("doc_id"), col("start_offset")).as[(Long, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    assert(a == b)
    assert(a.map(_._1) == Set(1L, 3L))
  }
}
