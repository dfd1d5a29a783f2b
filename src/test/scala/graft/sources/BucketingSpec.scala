package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the point of bucketed storage: two tables bucketed the same way
  * join and re-aggregate with NO shuffle of either side — the layout
  * contract the big fact tables rely on at scale. Broadcast joins are
  * disabled inside the first test (at test scale everything would
  * broadcast; at the 100 TB scale this layout exists for, neither fact
  * side fits in memory, so the shuffled-join path is the honest baseline).
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed fact-fact join plans without a shuffle on either side") {
    dropTable("graft_tst_orders_b"); dropTable("graft_tst_lineitem_b")
    Sinks.parquetBucketed(spark.read.parquet(s"$sf/orders.parquet"),
      "graft_tst_orders_b", 8, Seq("o_orderkey"), Seq("o_orderkey"))
    Sinks.parquetBucketed(spark.read.parquet(s"$sf/lineitem.parquet"),
      "graft_tst_lineitem_b", 8, Seq("l_orderkey"), Seq("l_orderkey"))

    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val o = spark.table("graft_tst_orders_b")
      val l = spark.table("graft_tst_lineitem_b")
      val joined = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join/agg must not shuffle:\n" + plan.take(1500))
      assert(plan.contains("SortMergeJoin"), plan.take(800))

      val expected = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("qty"))
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    }
  }

  test("the same join over plain (unbucketed) parquet DOES shuffle — the baseline") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
      val joined = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      assert(joined.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    }
  }
}
