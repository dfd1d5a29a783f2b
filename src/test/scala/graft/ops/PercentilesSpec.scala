package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PercentilesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Spark's Percentile.getPercentile / DuckDB quantile_cont reference. */
  private def quantileCont(sorted: Seq[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
  }

  test("exactQuantiles equals the interpolating reference, per group, with dups") {
    val rows = (1 to 37).map(i => ("a", (i % 11).toDouble)) ++
      (1 to 10).map(i => ("b", i * 100.0))
    val got = Percentiles.exactQuantiles(rows.toDF("g", "v"), Seq("g"), "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for (g <- Seq("a", "b")) {
      val sorted = rows.filter(_._1 == g).map(_._2).sorted
      val want = (quantileCont(sorted, 0.25), quantileCont(sorted, 0.5),
        quantileCont(sorted, 0.95))
      assert(got(g) == want, g)
    }
  }

  test("exactQuantilesDisc returns the value at rank floor(p*(n-1)), per group, with dups") {
    val rows = (1 to 37).map(i => ("a", (i % 11).toDouble)) ++
      (1 to 10).map(i => ("b", i * 100.0))
    val got = Percentiles.exactQuantilesDisc(rows.toDF("g", "v"), Seq("g"), "v",
        Seq("p20" -> 0.2, "p40" -> 0.4, "p95" -> 0.95))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for (g <- Seq("a", "b")) {
      val sorted = rows.filter(_._1 == g).map(_._2).sorted
      def at(p: Double) = sorted(math.floor(p * (sorted.length - 1)).toInt)
      assert(got(g) == ((at(0.2), at(0.4), at(0.95))), g)
      // every returned threshold IS a data value — the disc contract
      got(g).productIterator.foreach(v => assert(sorted.contains(v), g))
    }
  }

  test("winsorize clips to the group bounds, passes nulls, leaves inliers alone") {
    val rows = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", Some(4.0)),
      ("a", Some(5.0)), ("a", Some(6.0)), ("a", Some(7.0)), ("a", Some(8.0)),
      ("a", Some(9.0)), ("a", Some(1000.0)), // outlier
      ("a", None),
      ("b", Some(-50.0)), ("b", Some(0.0)), ("b", Some(1.0)), ("b", Some(2.0)),
      ("b", Some(3.0)))
    val df = rows.toDF("g", "v")
    val got = Percentiles.winsorize(df, Seq("g"), "v", 0.1, 0.9, "c")
      .select(col("g"), col("v"), col("c"))
      .as[(String, Option[Double], Option[Double])].collect()
    val bounds = Seq("a", "b").map { g =>
      val sorted = rows.filter(r => r._1 == g && r._2.isDefined).map(_._2.get).sorted
      g -> (quantileCont(sorted, 0.1), quantileCont(sorted, 0.9))
    }.toMap
    got.foreach {
      case (_, None, c) => assert(c.isEmpty, "null passes through unclipped")
      case (g, Some(v), Some(c)) =>
        val (lo, hi) = bounds(g)
        assert(c == math.min(math.max(v, lo), hi), s"$g $v")
      case other => fail(s"unexpected $other")
    }
    // the outlier was actually clipped and an inlier was not
    assert(got.exists { case (g, v, c) => g == "a" && v.contains(1000.0) && !c.contains(1000.0) })
    assert(got.exists { case (g, v, c) => g == "a" && v.contains(5.0) && c.contains(5.0) })
  }

  test("minMaxScale maps group extremes to 0/1, constants to 0, nulls through") {
    val rows = Seq(
      ("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(15.0)), ("a", None),
      ("c", Some(7.0)), ("c", Some(7.0))) // constant group
    val got = Percentiles.minMaxScale(rows.toDF("g", "v"), Seq("g"), "v", "s")
      .select(col("g"), col("v"), col("s"))
      .as[(String, Option[Double], Option[Double])].collect().toSet
    assert(got == Set(
      ("a", Some(10.0), Some(0.0)), ("a", Some(20.0), Some(1.0)),
      ("a", Some(15.0), Some(0.5)), ("a", None, None),
      ("c", Some(7.0), Some(0.0)), ("c", Some(7.0), Some(0.0))))
  }

  test("zscoreExact matches the float reference, zero-variance groups emit 0") {
    val rows = Seq(
      ("a", Some(1L)), ("a", Some(2L)), ("a", Some(3L)), ("a", Some(10L)),
      ("a", None),
      ("b", Some(5L)), ("b", Some(5L)), ("b", Some(5L)), // zero variance
      ("c", Some(-4L)), ("c", Some(4L)))
    val got = Percentiles.zscoreExact(rows.toDF("g", "v"), Seq("g"), "v", "z")
      .select(col("g"), col("v"), col("z"))
      .as[(String, Option[Long], Option[Double])].collect()
    got.foreach {
      case (_, None, z) => assert(z.isEmpty, "null passes through")
      case (g, Some(v), Some(z)) =>
        val vs = rows.filter(r => r._1 == g && r._2.isDefined).map(_._2.get.toDouble)
        val n = vs.length
        val mean = vs.sum / n
        val varP = vs.map(x => (x - mean) * (x - mean)).sum / n
        if (varP == 0.0) assert(z == 0.0, s"$g constant group")
        else assert(math.abs(z - (v - mean) / math.sqrt(varP)) < 1e-12, s"$g $v")
      case other => fail(s"unexpected $other")
    }
    // population z of {-4, 4} is exactly -1/+1 — exact moments make it bitwise
    assert(got.filter(_._1 == "c").flatMap(_._3).sorted.toSeq == Seq(-1.0, 1.0))
  }

  test("zscoreExact is invariant to partitioning (exact moments, no float sums)") {
    val rows = (1 to 997).map(i => ("g", (i * 37 % 101).toLong))
    val one = Percentiles.zscoreExact(
      rows.toDF("g", "v").repartition(1), Seq("g"), "v", "z")
      .select(col("v"), col("z")).as[(Long, Double)].collect().toMap
    val many = Percentiles.zscoreExact(
      rows.toDF("g", "v").repartition(32), Seq("g"), "v", "z")
      .select(col("v"), col("z")).as[(Long, Double)].collect().toMap
    assert(one == many, "bit-identical across partitionings")
  }

  test("winsorize guards its quantile range") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Percentiles.winsorize(df, Seq("g"), "v", 0.9, 0.1, "c")
    }
  }

  test("madOutliers: hand-computed medians, scores, and the lone outlier") {
    // med = 5.5; absdevs sorted: .5 .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 94.5
    // → MAD = 2.5; z_rob(100) = 94.5/(1.4826·2.5) ≈ 25.5 — only outlier
    val vals = (1 to 9).map(_.toDouble) :+ 100.0
    val df = vals.map(("a", _)).toDF("g", "v")
    // output order: g, v, robust_z, is_outlier (join key leads)
    val out = Percentiles.madOutliers(df, Seq("g"), "v", threshold = 3.5)
      .collect().map(r => r.getDouble(1) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(100.0)._1 == 94.5 / (1.4826 * 2.5))
    assert(out(100.0)._2)
    assert(out(1.0)._1 == -4.5 / (1.4826 * 2.5) && !out(1.0)._2)
    assert(out.count(_._2._2) == 1, "exactly one outlier")
  }

  test("madOutliers: zero-MAD groups and null values yield null, not artifacts") {
    val df = (Seq(("z", Some(5.0)), ("z", Some(5.0)), ("z", Some(5.0)),
      ("z", Some(9.0)), ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(30.0)),
      ("a", None))).toDF("g", "v")
    val rows = Percentiles.madOutliers(df, Seq("g"), "v", threshold = 3.5).collect()
    val z = rows.filter(_.getString(0) == "z")
    assert(z.forall(r => r.isNullAt(2) && r.isNullAt(3)),
      "≥50% at the median → MAD 0 → undefined score")
    val aNull = rows.filter(r => r.getString(0) == "a" && r.isNullAt(1))
    assert(aNull.length == 1 && aNull.head.isNullAt(2) && aNull.head.isNullAt(3))
    // group a: med 2, absdev {1,0,28} → MAD 1; 30 → z = 28/1.4826 > 3.5
    val a30 = rows.find(r => !r.isNullAt(1) && r.getDouble(1) == 30.0).get
    assert(a30.getDouble(2) == 28.0 / 1.4826 && a30.getBoolean(3))
  }

  test("percentile-rank ppm: ties share, exact floors, null passes through") {
    // group a values 10,20,20,40 → le 1,3,3,4 of n=4 → 250000, 750000,
    // 750000, 1000000 ; group b single value → 1000000 ; null → null
    val df = Seq(("a", 1L, Some(10L)), ("a", 2L, Some(20L)),
      ("a", 3L, Some(20L)), ("a", 4L, Some(40L)), ("b", 5L, Some(7L)),
      ("a", 6L, None)).toDF("g", "id", "v")
    val got = Percentiles.percentileRankPpm(df, Seq("g"), "v", "pr_ppm")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(1L -> Some(250000L), 2L -> Some(750000L),
      3L -> Some(750000L), 4L -> Some(1000000L), 5L -> Some(1000000L),
      6L -> None))
  }

  test("percentile-rank ppm: a top-quantile cut is source-balanced") {
    // two sources with very different value scales: pr_ppm > 500000
    // keeps each source's own top half, regardless of scale
    val rows = (1 to 100).map(i => ("small", i.toLong, i.toLong)) ++
      (1 to 100).map(i => ("big", 1000L + i, 1000000L + i))
    val out = Percentiles.percentileRankPpm(
        rows.toDF("g", "id", "v").repartition(8), Seq("g"), "v", "pr_ppm")
      .filter(col("pr_ppm") > 500000L)
      .groupBy(col("g")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("small" -> 50L, "big" -> 50L))
  }

  test("madOutliers broadcasts both bounds tables back over the data") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val p = Percentiles.madOutliers(df, Seq("g"), "v", 3.5)
      .queryExecution.executedPlan.toString
    // the med join appears twice in the tree (feeding the MAD aggregate
    // AND the final score join) — what matters is that every join
    // broadcasts the group-row bounds and none sort-merges the data
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  // ---- quantile normalization ----

  test("quantileNormalize: same-shape groups land on identical reference values") {
    // A holds 1..10, B holds 101..110 — same shape, shifted scale. The
    // global reference is the 20 pooled values; after normalization both
    // groups must serve the SAME multiset of reference values.
    val df = ((1 to 10).map(v => ("A", v.toLong)) ++
      (1 to 10).map(v => ("B", v + 100L))).toDF("g", "v")
    val out = Percentiles.quantileNormalize(df, Seq("g"), "v", grid = 20, out = "qn")
    val byG = out.select("g", "qn").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted.toSeq }
    assert(byG("A") == byG("B"),
      s"normalized distributions must coincide: ${byG("A")} vs ${byG("B")}")
    // rank i of 10 → grid point 2i → the 2i-th pooled value
    val pooled = ((1 to 10).map(_.toLong) ++ (1 to 10).map(_ + 100L)).sorted
    assert(byG("A") == (1 to 10).map(i => pooled(2 * i - 1)).sorted)
  }

  test("quantileNormalize is the identity when the group IS the reference at full grid") {
    val df = (1 to 10).map(v => ("g", v.toLong)).toDF("g", "v")
    val out = Percentiles.quantileNormalize(df, Seq("g"), "v", grid = 10, out = "qn")
    assert(out.filter(col("qn") =!= col("v")).count() == 0L)
  }

  test("quantileNormalize: nulls pass through with null output, others unaffected") {
    val df = Seq(("g", Some(1L)), ("g", Some(2L)), ("g", None)).toDF("g", "v")
    val out = Percentiles.quantileNormalize(df, Seq("g"), "v", grid = 2, out = "qn")
    assert(out.filter(col("v").isNull && col("qn").isNotNull).count() == 0L)
    assert(out.filter(col("v").isNotNull && col("qn").isNull).count() == 0L)
  }

  test("quantileNormalize is monotone in the value within each group") {
    val df = (1 to 50).map(v => (s"g${v % 3}", (v * 7 % 23).toLong)).toDF("g", "v")
    val out = Percentiles.quantileNormalize(df, Seq("g"), "v", grid = 7, out = "qn")
      .select("g", "v", "qn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for (g <- out.map(_._1).distinct) {
      val rows = out.filter(_._1 == g).sortBy(_._2)
      val qns = rows.map(_._3)
      assert(qns.zip(qns.tail).forall { case (a, b) => a <= b },
        s"group $g not monotone: ${rows.toSeq}")
    }
  }

  test("quantileNormalize reference lookup is a broadcast equi-join, never a nested loop") {
    val df = (1 to 100).map(v => (s"g${v % 4}", v.toLong)).toDF("g", "v")
    val p = Percentiles.quantileNormalize(df, Seq("g"), "v", grid = 10, out = "qn")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }
}
