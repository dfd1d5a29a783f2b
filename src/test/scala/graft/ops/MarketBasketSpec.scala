package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Market-basket invariants: hand-checked pair counts (duplicate items
  * in one basket count ONCE), support threshold, both-direction rules
  * with exact confidence/lift, and the per-basket (never cross-basket)
  * join shape. Independent end-to-end check: the q154 oracle.
  */
class MarketBasketSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // baskets: {1:(a,b,c)}, {2:(a,b)}, {3:(a,b,b)}, {4:(c)}, {5:(a)}
  private lazy val df = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "b"), (3L, "b"),
    (4L, "c"), (5L, "a"),
  ).toDF("basket", "item")

  test("co-occurrence counts baskets, deduping within-basket repeats") {
    val got = MarketBasket.coOccurrence(df, "basket", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 3L, ("a", "c") -> 1L, ("b", "c") -> 1L))
  }

  test("support threshold prunes rare pairs") {
    val got = MarketBasket.coOccurrence(df, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b")))
  }

  test("rules: both directions, exact confidence and lift") {
    val got = MarketBasket.rules(df, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // n(a)=4, n(b)=3, n(ab)=3, total baskets=5
    assert(got(("a", "b")) == (3L, 4L, 3.0 / 4, 15.0 / 12))
    assert(got(("b", "a")) == (3L, 3L, 1.0, 15.0 / 12))
    assert(got.size == 2)
  }

  test("the pair join is per-basket — no cartesian") {
    val p = MarketBasket.rules(df, "basket", "item")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }
}
