package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class HistogramSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(values: Seq[(String, Long)], w: Long,
                  qs: Seq[(Int, Int)]): Map[(String, Int, Int), (Long, Long)] = {
    val df = values.toDF("g", "v")
    HistogramSketch.quantileSketch(df, Seq("g"), "v", w, qs)
      .select("g", "p_num", "p_den", "n", "est")
      .as[(String, Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
  }

  /** Driver replay of the integer walk. */
  private def reference(values: Seq[Long], w: Long, num: Int, den: Int): Long = {
    val hist = values.groupBy(_ / w).map { case (b, vs) => b -> vs.size.toLong }
      .toSeq.sortBy(_._1)
    val n = values.size.toLong
    val rank = (num * n + den - 1) / den
    var cum = 0L
    for ((b, cnt) <- hist) {
      val before = cum
      cum += cnt
      if (before < rank && rank <= cum)
        return b * w + (rank - before) * w / cnt
    }
    fail("rank not reached")
  }

  test("matches the driver walk on random data, multiple groups and quantiles") {
    val rnd = new Random(3)
    val data = for (g <- Seq("a", "b"); _ <- 1 to 500)
      yield (g, rnd.nextInt(100000).toLong)
    val qs = Seq((1, 2), (19, 20), (99, 100))
    val got = run(data, w = 1000L, qs)
    for (g <- Seq("a", "b"); (num, den) <- qs) {
      val vs = data.filter(_._1 == g).map(_._2)
      assert(got((g, num, den)) == ((500L, reference(vs, 1000L, num, den))),
        s"group $g q$num/$den")
    }
  }

  test("estimate lands within one bin width of the exact quantile") {
    val rnd = new Random(5)
    val vs = Seq.fill(2000)(math.abs(rnd.nextGaussian() * 10000).toLong)
    val w = 500L
    val got = run(vs.map(("g", _)), w, Seq((1, 2), (19, 20)))
    val sorted = vs.sorted
    for ((num, den) <- Seq((1, 2), (19, 20))) {
      val rank = (num.toLong * vs.size + den - 1) / den
      val exact = sorted((rank - 1).toInt)
      val est = got(("g", num, den))._2
      assert(math.abs(est - exact) <= w,
        s"q$num/$den: est $est vs exact $exact (w=$w)")
    }
  }

  test("store: appended batches serve exactly the one-shot sketch, any slicing") {
    val rnd = new Random(5)
    val vals = Seq.fill(300)(("g" + rnd.nextInt(3), rnd.nextInt(5000).toLong))
    val qs = Seq((1, 2), (9, 10))
    val t = "graft_test_hist_store"
    dropTable(t)
    val df = vals.toDF("g", "v")
    // three uneven slices
    HistogramSketch.appendToStore(df.filter($"v" % 7 === 0), Seq("g"), "v", 100L, t)
    HistogramSketch.appendToStore(df.filter($"v" % 7 === 1), Seq("g"), "v", 100L, t)
    HistogramSketch.appendToStore(df.filter($"v" % 7 >= 2), Seq("g"), "v", 100L, t)
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.select("g", "p_num", "p_den", "n", "est")
        .as[(String, Int, Int, Long, Long)].collect().toSet
    val served = canon(HistogramSketch.quantilesFromStore(spark, t, Seq("g"), 100L, qs))
    val oneShot = canon(HistogramSketch.quantileSketch(df, Seq("g"), "v", 100L, qs))
    assert(served == oneShot)
    dropTable(t)
  }

  test("degenerate cases: single value, single bin, q=1 (max bin)") {
    val got = run(Seq(("g", 42L)), w = 10L, Seq((1, 2), (1, 1)))
    // one value in bin 4: rank 1, est = 40 + 1*10/1 = 50 for both
    assert(got(("g", 1, 2)) == ((1L, 50L)))
    assert(got(("g", 1, 1)) == ((1L, 50L)))

    val tight = run((1L to 9L).map(("g", _)), w = 100L, Seq((1, 1)))
    // all nine values in bin 0: rank 9, est = 0 + 9*100/9 = 100
    assert(tight(("g", 1, 1)) == ((9L, 100L)))
  }
}
