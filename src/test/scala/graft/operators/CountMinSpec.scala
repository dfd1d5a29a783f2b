package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- plain-Scala replica of the portable 60-bit family ----
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
  private def rot60(h: Long, r: Int): Long =
    (h % (1L << (60 - r))) * (1L << r) + (h >>> (60 - r))
  private def bucketOf(t: String, rot: Int, c: Long, w: Int): Long =
    (rot60(hash60(t), rot) ^ c) % w

  /** Naive CMS built in Scala with the same constants. */
  private def naiveEstimates(tokens: Seq[String], depth: Int, width: Int,
                             seed: Long): Map[String, Long] = {
    val consts = PortableHash.permConstants(depth, seed)
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    tokens.foreach { t =>
      consts.zipWithIndex.foreach { case ((r, c), j) =>
        val k = (j, bucketOf(t, r, c, width))
        cells(k) = cells.getOrElse(k, 0L) + 1
      }
    }
    tokens.distinct.map { t =>
      t -> consts.zipWithIndex.map { case ((r, c), j) =>
        cells.getOrElse((j, bucketOf(t, r, c, width)), 0L)
      }.min
    }.toMap
  }

  // Zipf-ish corpus: token "t<k>" appears 60/k times — guaranteed collisions
  // at width 16 so the over-estimation path is actually exercised.
  private val tokens: Seq[String] =
    (1 to 30).flatMap(k => Seq.fill(60 / k)(s"t$k"))

  test("sketch + estimate equal the naive count-min with identical constants") {
    val df = tokens.map(Tuple1(_)).toDF("token")
    for ((d, w) <- Seq((2, 16), (4, 64))) {
      val sk = CountMin.sketch(df, "token", d, w)
      val probes = df.distinct()
      val got = CountMin.estimate(sk, probes, "token", d, w)
        .select(col("token"), col("est_n")).as[(String, Long)].collect().toMap
      assert(got == naiveEstimates(tokens, d, w, 42L), s"d=$d w=$w")
    }
  }

  test("estimates never under-count, and are exact at collision-free width") {
    val df = tokens.map(Tuple1(_)).toDF("token")
    val exact = tokens.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val narrow = CountMin.estimate(CountMin.sketch(df, "token", 4, 16),
        df.distinct(), "token", 4, 16)
      .select(col("token"), col("est_n")).as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) => assert(narrow(t) >= n, t) }
    // 2^16 buckets for 30 distinct tokens: collisions in all 4 rows are
    // astronomically unlikely, so every estimate is exact.
    val wide = CountMin.estimate(CountMin.sketch(df, "token", 4, 65536),
        df.distinct(), "token", 4, 65536)
      .select(col("token"), col("est_n")).as[(String, Long)].collect().toMap
    assert(wide == exact)
  }

  test("tokens the sketch never saw estimate to 0") {
    val sk = CountMin.sketch(tokens.map(Tuple1(_)).toDF("token"), "token", 4, 1 << 20)
    val got = CountMin.estimate(sk, Seq("absent-token").toDF("token"),
        "token", 4, 1 << 20)
      .select(col("est_n")).as[Long].collect()
    assert(got.toSeq == Seq(0L))
  }

  test("merging batch sketches equals sketching the concatenated corpus") {
    val (batchA, batchB) = tokens.splitAt(tokens.size / 3)
    val merged = CountMin.merge(
        CountMin.sketch(batchA.map(Tuple1(_)).toDF("token"), "token", 3, 32),
        CountMin.sketch(batchB.map(Tuple1(_)).toDF("token"), "token", 3, 32))
      .as[(Int, Long, Long)].collect().toSet
    val whole = CountMin.sketch(tokens.map(Tuple1(_)).toDF("token"), "token", 3, 32)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("fast family: never under-counts, exact when collision-free, mass-conserving") {
    val df = tokens.map(Tuple1(_)).toDF("token")
    val exact = tokens.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val narrow = CountMin.estimateFast(CountMin.sketchFast(df, "token", 4, 16),
        df.distinct(), "token", 4, 16)
      .select(col("token"), col("est_n")).as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) => assert(narrow(t) >= n, t) }
    val wide = CountMin.estimateFast(CountMin.sketchFast(df, "token", 4, 65536),
        df.distinct(), "token", 4, 65536)
      .select(col("token"), col("est_n")).as[(String, Long)].collect().toMap
    assert(wide == exact)
    val sk = CountMin.sketchFast(df, "token", 3, 8).collect()
    assert(sk.length <= 3 * 8)
    val perRow = sk.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.values.toSet == Set(tokens.size.toLong))
  }

  test("fast family: merging batch sketches equals sketching the concatenation") {
    val (batchA, batchB) = tokens.splitAt(tokens.size / 3)
    val merged = CountMin.merge(
        CountMin.sketchFast(batchA.map(Tuple1(_)).toDF("token"), "token", 3, 32),
        CountMin.sketchFast(batchB.map(Tuple1(_)).toDF("token"), "token", 3, 32))
      .as[(Int, Long, Long)].collect().toSet
    val whole = CountMin.sketchFast(tokens.map(Tuple1(_)).toDF("token"), "token", 3, 32)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("native aggregate build is cell-for-cell equal to sketchFast (nulls, repartitioned, merge-compatible)") {
    // nulls included: the builtin xxhash64 SKIPS null inputs (seed passes
    // through), so a null token lands in row j's hash-of-j bucket — the
    // aggregate must replay that, not drop the row.
    val withNulls = tokens.map(Option(_)) ++ Seq(None, None, None)
    // 7 partitions so partial buffers actually serialize and merge
    val df = withNulls.map(Tuple1(_)).toDF("token").repartition(7)
    for ((d, w) <- Seq((3, 16), (4, 64))) {
      val viaAgg = CountMin.sketchAggFast(df, "token", d, w)
        .as[(Int, Long, Long)].collect().toSet
      val viaExplode = CountMin.sketchFast(df, "token", d, w)
        .as[(Int, Long, Long)].collect().toSet
      assert(viaAgg == viaExplode, s"d=$d w=$w")
    }
    // the table is interchangeable: merge across build paths, estimate on top
    val (batchA, batchB) = tokens.splitAt(tokens.size / 3)
    val merged = CountMin.merge(
        CountMin.sketchAggFast(batchA.map(Tuple1(_)).toDF("token"), "token", 3, 32),
        CountMin.sketchFast(batchB.map(Tuple1(_)).toDF("token"), "token", 3, 32))
      .as[(Int, Long, Long)].collect().toSet
    val whole = CountMin.sketchAggFast(tokens.map(Tuple1(_)).toDF("token"), "token", 3, 32)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("native aggregate build folds raw tokens — no Generate below the partial aggregate") {
    val df = tokens.map(Tuple1(_)).toDF("token")
    val agg = CountMin.sketchAggFast(df, "token", 4, 1024)
      .queryExecution.executedPlan.toString
    assert(agg.contains("ObjectHashAggregate"),
      "TypedImperativeAggregate should plan as ObjectHashAggregate:\n" + agg.take(800))
    // the only Generate is the trailing SKETCH-SIZED posexplode of the
    // final cell array; the corpus side (below partial_cms_sketch, which
    // prints after it top-down) must feed the aggregate directly
    val belowPartial = agg.substring(agg.indexOf("partial_cms_sketch"))
    assert(!belowPartial.contains("Generate"),
      "tokens must fold directly into the buffer, not explode first:\n" + agg.take(800))
    // the composed build DOES explode the corpus — the cost the aggregate removes
    val composed = CountMin.sketchFast(df, "token", 4, 1024)
      .queryExecution.executedPlan.toString
    val composedBelowPartial = composed.substring(composed.indexOf("partial_count"))
    assert(composedBelowPartial.contains("Generate"))
  }

  test("heavy hitters are EXACT despite the sketch prefilter, on both families") {
    val df = tokens.map(Tuple1(_)).toDF("token")
    val n = tokens.size.toLong
    for (phi <- Seq(0.005, 0.02, 0.1)) {
      val thresh = math.max(1L, math.ceil(phi * n).toLong)
      val expect = tokens.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= thresh).toMap
      // narrow width (16) forces collisions: the prefilter admits false
      // positives and the exact count must remove every one of them
      for (w <- Seq(16, 1024)) {
        val portable = CountMin.heavyHitters(df, "token", phi, 4, w)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        assert(portable.map(t => t._1 -> t._2).toMap == expect,
          s"portable phi=$phi w=$w")
        portable.foreach { case (t, exa, est) =>
          assert(est >= exa, s"CMS must never under-estimate: $t") }
        val fast = CountMin.heavyHittersFast(df, "token", phi, 4, w)
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        assert(fast == expect, s"fast phi=$phi w=$w")
      }
    }
  }

  test("heavy hitters on an empty corpus return no rows") {
    val empty = Seq.empty[String].map(Tuple1(_)).toDF("token")
    assert(CountMin.heavyHitters(empty, "token", 0.01, 2, 16).count() == 0L)
  }

  test("the sketch is bounded by depth×width and conserves per-row mass") {
    val df = tokens.map(Tuple1(_)).toDF("token")
    val sk = CountMin.sketch(df, "token", 3, 8).collect()
    assert(sk.length <= 3 * 8)
    val perRow = sk.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.values.toSet == Set(tokens.size.toLong))
  }
}
