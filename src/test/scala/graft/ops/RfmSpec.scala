package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class RfmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d ${hour}%02d:00:00")

  test("scores match a driver-side replay: anchor, integral recency, cents, disc cuts") {
    // 6 users with distinct recency/frequency/monetary shapes
    val ev = Seq(
      (1L, ts(1), 10.00), (1L, ts(2), 10.00),                     // old, light
      (2L, ts(28), 50.01), (2L, ts(29), 50.02), (2L, ts(30), 0.97),
      (3L, ts(15), 5.00),
      (4L, ts(30, 12), 200.00), (4L, ts(30, 13), 1.00),
      (5L, ts(10), 33.33), (5L, ts(20), 33.34), (5L, ts(25), 33.33),
      (6L, ts(30, 13), 999.99)
    ).toDF("user_id", "ts", "value")
    val got = Rfm.scores(ev, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7))).toMap

    // driver replay
    val rows = Seq(
      1L -> Seq((ts(1), 1000L), (ts(2), 1000L)),
      2L -> Seq((ts(28), 5001L), (ts(29), 5002L), (ts(30), 97L)),
      3L -> Seq((ts(15), 500L)),
      4L -> Seq((ts(30, 12), 20000L), (ts(30, 13), 100L)),
      5L -> Seq((ts(10), 3333L), (ts(20), 3334L), (ts(25), 3333L)),
      6L -> Seq((ts(30, 13), 99999L)))
    val anchor = rows.flatMap(_._2.map(_._1.getTime)).max * 1000L
    val base = rows.map { case (u, es) =>
      val rec = (anchor - es.map(_._1.getTime).max * 1000L) / 86400000000L
      (u, rec, es.size.toLong, es.map(_._2).sum)
    }
    def cuts(vs: Seq[Long]): Seq[Long] = {
      val sorted = vs.sorted
      (1 to 4).map(i =>
        sorted(math.floor(i / 5.0 * (sorted.length - 1)).toInt))
    }
    val rC = cuts(base.map(-_._2)); val fC = cuts(base.map(_._3))
    val mC = cuts(base.map(_._4))
    def sc(v: Long, cs: Seq[Long]): Int = 1 + cs.count(v > _)
    base.foreach { case (u, rec, f, m) =>
      val (r, fs, ms) = (sc(-rec, rC), sc(f, fC), sc(m, mC))
      assert(got(u) == ((rec, f, m, r, fs, ms, r * 100 + fs * 10 + ms)),
        s"user $u")
    }
    // monetary cents are exact despite float dollars (0.97+50.01+50.02)
    assert(got(2L)._3 == 10100L)
    graft.Storage.releaseAll(spark)
  }
}
