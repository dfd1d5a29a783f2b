package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel/cohort invariants: strict event-time ordering (a click BEFORE
  * the signup does not count; one AT the same instant does not either),
  * monotone non-increasing stage counts, out-of-order log robustness,
  * and the cohort matrix on a hand-checkable timeline. Independent
  * end-to-end checks: the q141/q142 oracles.
  */
class FunnelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  // u1 completes all 3 stages in order; u2 clicks BEFORE signup (stuck at
  // signup); u3 clicks AT the signup instant (strictly-after excludes it);
  // u4 never signs up; u5 signup→click, no purchase
  private lazy val ev = Seq(
    (1L, "signup", ts(1, 9)), (1L, "click", ts(1, 10)), (1L, "purchase", ts(2, 9)),
    (2L, "click", ts(1, 8)), (2L, "signup", ts(1, 9)), (2L, "purchase", ts(1, 7)),
    (3L, "signup", ts(3, 9)), (3L, "click", ts(3, 9)),
    (4L, "click", ts(1, 9)), (4L, "purchase", ts(1, 10)),
    (5L, "signup", ts(5, 9)), (5L, "click", ts(6, 9)),
  ).toDF("user_id", "event_type", "ts")

  test("strict ordering: counts are 4 signups, 2 clicks-after, 1 purchase") {
    val got = Funnel.funnelCounts(ev, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map((0, "signup") -> 4L, (1, "click") -> 2L,
      (2, "purchase") -> 1L))
  }

  test("stage counts never increase, shuffled input changes nothing") {
    val shuffled = ev.orderBy(rand(7))
    val counts = Funnel.funnelCounts(shuffled, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .collect().sortBy(_.getInt(0)).map(_.getLong(2))
    assert(counts.toSeq == Seq(4L, 2L, 1L))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("conversion window: a stage past the gap stops counting") {
    // u1 clicks 1h after signup (inside any window); u5 clicks a day
    // later (outside a 2h window, inside 48h)
    def counts(gap: Option[Long]) =
      Funnel.funnelCounts(ev, "user_id", "event_type", "ts",
          Seq("signup", "click"), maxGapSeconds = gap)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(counts(None)(1) == 2L)
    assert(counts(Some(2L * 3600))(1) == 1L)   // only u1's 1h click
    assert(counts(Some(48L * 3600))(1) == 2L)  // u5's next-day click back in
  }

  test("last-touch attribution: latest click at-or-before wins, none → dropped") {
    // the q146 composition, hand-checkable
    val ev = Seq(
      (10L, 1L, "click", ts(1, 9)), (11L, 1L, "purchase", ts(1, 10)),
      (12L, 1L, "click", ts(1, 11)), (13L, 1L, "purchase", ts(1, 12)),
      (14L, 1L, "purchase", ts(1, 13)),             // same click 12 again
      (20L, 2L, "purchase", ts(1, 8)),              // before any click
      (21L, 2L, "click", ts(1, 9)),
      (30L, 3L, "click", ts(2, 9)), (31L, 3L, "purchase", ts(2, 9)), // tie
    ).toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(1.5))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val got = AsofJoin.backward(purchases, clicks, Seq("user_id"), "ts",
        Seq("click_id"))
      .filter(col("click_id").isNotNull)
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0)).cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(10L -> (1L, 150L), 12L -> (2L, 300L), 30L -> (1L, 150L)))
  }

  test("cohort retention on a hand-checkable timeline") {
    val got = Funnel.cohortRetention(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    // day-1 cohort: u1 (active d1, d2), u2 (d1), u4 (d1)
    assert(got(("2024-01-01", 0L)) == 3L)
    assert(got(("2024-01-01", 1L)) == 1L)
    // day-3 cohort: u3; day-5 cohort: u5 active d5 and d6
    assert(got(("2024-01-03", 0L)) == 1L)
    assert(got(("2024-01-05", 0L)) == 1L && got(("2024-01-05", 1L)) == 1L)
    assert(got.values.sum == got.size + 2) // only u1/u5 have k>0 cells
  }
}
