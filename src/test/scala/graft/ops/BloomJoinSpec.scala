package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val probe = (1L to 500L).map(i => (i, s"p$i")).toDF("k", "payload")
  private val build = Seq(3L, 7L, 7L, 250L, 499L, 1000L).map(Tuple1(_)).toDF("bk")

  private def expected: Set[Long] = Set(3L, 7L, 250L, 499L)

  test("bloomSemiJoin equals the plain left-semi join") {
    val got = BloomJoin.bloomSemiJoin(probe, build, "k", "bk",
        expectedItems = 100, fpp = 0.01)
      .select(col("k")).as[Long].collect().toSet
    assert(got == expected)
  }

  test("an undersized filter (forced false positives) stays exact") {
    // expectedItems=1 at fpp near the max load: the filter saturates and
    // passes many non-members — the trailing semi join must erase them all.
    val got = BloomJoin.bloomSemiJoin(probe, build, "k", "bk",
        expectedItems = 1, fpp = 0.5)
      .select(col("k")).as[Long].collect().toSet
    assert(got == expected)
  }

  test("the probe is filtered by might_contain BEFORE the join") {
    // A literal-backed probe would be constant-folded into a LocalTableScan
    // (filter evaluated at plan time); spark.range keeps a codegen'd leaf so
    // the physical Filter — and its position before the join — is visible.
    val rangeProbe = spark.range(1, 501).select(
      col("id").as("k"), concat(lit("p"), col("id")).as("payload"))
    val plan = BloomJoin.bloomSemiJoin(rangeProbe, build, "k", "bk",
      expectedItems = 100, fpp = 0.01).queryExecution.executedPlan.toString
    val filterAt = plan.indexOf("might_contain")
    val joinAt = plan.indexOf("Join")
    assert(filterAt >= 0, plan)
    assert(joinAt >= 0 && joinAt < filterAt,
      s"filter should sit below the join in the plan tree:\n$plan")
  }

  test("string keys fail loudly instead of silently dropping rows") {
    // stat.bloomFilter would insert strings via putBinary while the probe
    // checks the long domain — the contract violation must error, not
    // return a near-empty "exact" result.
    val sProbe = Seq(("3", "a")).toDF("k", "payload")
    val sBuild = Seq(Tuple1("3")).toDF("bk")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(sProbe, sBuild, "k", "bk", expectedItems = 10)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("null probe keys are dropped (same as the semi join's null semantics)") {
    val p = Seq((Some(3L), "a"), (None, "b")).toDF("k", "payload")
    val got = BloomJoin.bloomSemiJoin(p, build, "k", "bk",
        expectedItems = 10, fpp = 0.01)
      .select(col("payload")).as[String].collect().toSet
    assert(got == Set("a"))
  }
}
