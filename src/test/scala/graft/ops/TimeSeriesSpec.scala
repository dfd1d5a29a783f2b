package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (user, ts-micros, event_id, value) — interleaved input order
  private val events = Seq(
    (1L, 30L, 103L, 4.0), (1L, 10L, 101L, 1.0), (1L, 20L, 102L, 2.5),
    (2L, 10L, 201L, 7.0),
    (3L, 10L, 301L, 1.0), (3L, 10L, 302L, 3.0), // same ts: event_id breaks the tie
  ).toDF("user_id", "ts", "event_id", "value")

  private def naiveEwma(vals: Seq[Double], a: Double): Double =
    vals.tail.foldLeft(vals.head)((acc, x) => a * x + (1 - a) * acc)

  test("ewmaLast equals the seeded left fold in (ts, event_id) order") {
    val got = TimeSeries.ewmaLast(events.repartition(7), "user_id",
        col("ts"), col("event_id"), "value", alpha = 0.25)
      .select(col("user_id"), col("n_events"), col("ewma"))
      .as[(Long, Long, Double)].collect()
      .map { case (u, n, e) => u -> ((n, e)) }.toMap
    assert(got(1L) == ((3L, naiveEwma(Seq(1.0, 2.5, 4.0), 0.25))))
    assert(got(2L) == ((1L, 7.0))) // single event: the seed itself
    assert(got(3L) == ((2L, naiveEwma(Seq(1.0, 3.0), 0.25))))
  }

  test("the fold order is the sort order, not the input order") {
    // reversed arrival must give the identical result
    val rev = events.orderBy(col("ts").desc, col("event_id").desc)
    val a = TimeSeries.ewmaLast(events, "user_id", col("ts"), col("event_id"),
      "value", 0.25).select(col("user_id"), col("ewma")).as[(Long, Double)].collect().toSet
    val b = TimeSeries.ewmaLast(rev, "user_id", col("ts"), col("event_id"),
      "value", 0.25).select(col("user_id"), col("ewma")).as[(Long, Double)].collect().toSet
    assert(a == b)
  }
}
