package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ids = (0L until 2000L).toDF("id")

  test("splitAssign is disjoint, exhaustive, and roughly proportioned") {
    val counts = ids.select(Sampling.splitAssign(col("id"), "s1").as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1400 && counts("train") < 1800, counts.toString)
    assert(counts("valid") > 100 && counts("valid") < 300, counts.toString)
  }

  test("splits are deterministic and change completely under a new salt") {
    val a = ids.select(col("id"), Sampling.splitAssign(col("id"), "s1").as("sp"))
      .as[(Long, String)].collect().toMap
    val b = ids.select(col("id"), Sampling.splitAssign(col("id"), "s1").as("sp"))
      .as[(Long, String)].collect().toMap
    assert(a == b, "same salt must reproduce identical assignment")
    val c = ids.select(col("id"), Sampling.splitAssign(col("id"), "other").as("sp"))
      .as[(Long, String)].collect().toMap
    assert(a != c, "a different salt must re-deal the split")
  }

  test("sampleFraction nests monotonically: 5% sample is a subset of 10%") {
    val s05 = Sampling.sampleFraction(ids, "id", 0.05, "s1").as[Long].collect().toSet
    val s10 = Sampling.sampleFraction(ids, "id", 0.10, "s1").as[Long].collect().toSet
    assert(s05.subsetOf(s10))
    assert(s10.size > 150 && s10.size < 250, s10.size.toString)
  }

  test("mixCorpora tags, downsamples per weight, and isolates re-weighting") {
    val web = (0L until 1000L).toDF("id")
    val books = (0L until 1000L).toDF("id")
    val mixed = Sampling.mixCorpora(
      Seq(("web", web, 0.3), ("books", books, 0.9)), "id")
    val counts = mixed.groupBy("corpus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("web") > 200 && counts("web") < 400, counts.toString)
    assert(counts("books") > 800 && counts("books") <= 1000, counts.toString)
    // re-weighting web must not change which books rows survive
    val booksOnly = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("corpus") === "books").select("id").as[Long].collect().toSet
    val reweighted = Sampling.mixCorpora(
      Seq(("web", web, 0.05), ("books", books, 0.9)), "id")
    assert(booksOnly(mixed) == booksOnly(reweighted))
  }

  test("adding rows never moves existing rows between splits") {
    val small = (0L until 500L).toDF("id")
    val a = small.select(col("id"), Sampling.splitAssign(col("id"), "s1").as("sp"))
      .as[(Long, String)].collect().toMap
    val grown = ids.select(col("id"), Sampling.splitAssign(col("id"), "s1").as("sp"))
      .as[(Long, String)].collect().toMap
    a.foreach { case (id, sp) => assert(grown(id) == sp) }
  }

  // Driver-side replica of the operator's integer A-ES key.
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  private def aesKey(salt: String, id: Long, w: Long): Long =
    (1L to w).map(j => hash60(s"$salt:$id:$j")).max

  test("weightedSample equals the naive A-ES computation, partition-independent") {
    val df = (0L until 300L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val expected = (0L until 300L).map(i => (i, i % 7 + 1))
      .map { case (i, w) => (i, aesKey("t", i, w)) }
      .sortBy { case (i, key) => (-key, i) }.take(25)
    val got = Sampling.weightedSample(df, "id", "w", k = 25, salt = "t")
      .select(col("id"), col("wrs_key")).as[(Long, Long)].collect().toSeq
    assert(got.sortBy { case (i, key) => (-key, i) } == expected)
    val repart = Sampling.weightedSample(df.repartition(7), "id", "w", k = 25, salt = "t")
      .select(col("id")).as[Long].collect().toSet
    assert(repart == expected.map(_._1).toSet)
  }

  test("weightedSample inclusion probability is monotone in weight") {
    // 600 items in three weight classes 1/4/16 (200 each), k = 100:
    // proportional-allocation expectation is ~4.8 / ~19 / ~76 inclusions.
    // The draw is deterministic under the fixed salt, so the bounds below
    // pin monotonicity without flakiness.
    val df = (0L until 600L)
      .map(i => (i, Seq(1L, 4L, 16L)(i.toInt % 3))).toDF("id", "w")
    val counts = Sampling.weightedSample(df, "id", "w", k = 100, salt = "mono")
      .groupBy(col("w")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (c1, c4, c16) =
      (counts.getOrElse(1L, 0L), counts.getOrElse(4L, 0L), counts.getOrElse(16L, 0L))
    assert(c1 < c4 && c4 < c16, s"not monotone: $counts")
    assert(c1 <= 15 && c16 >= 55, s"far from proportional allocation: $counts")
    assert(c1 + c4 + c16 == 100)
  }

  test("weightedSample excludes non-positive weights and plans a top-k, not a sort") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -4L), (4L, 2L)).toDF("id", "w")
    val out = Sampling.weightedSample(df, "id", "w", k = 10, salt = "z")
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 4L))
    // A literal-backed frame constant-folds away, so pin the plan on a
    // codegen'd leaf (the BloomJoinSpec pattern): the top-k must be
    // per-partition heaps + a k-row merge, never a global Sort.
    val big = spark.range(0, 10000).select(col("id"), (col("id") % 9 + 1).as("w"))
    val plan = Sampling.weightedSample(big, "id", "w", k = 10, salt = "z")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("weightedSample fails loudly on a weight above maxWeight") {
    val df = Seq((1L, 3L), (2L, 50L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(df, "id", "w", k = 5, salt = "z", maxWeight = 10).collect()
    }
    assert(e.getMessage != null)
  }

  test("weightedSampleReplacement equals the driver inverse-CDF reference") {
    val items = (0L until 200L).map(i => (i, i % 5)) // weights 0..4; 0s excluded
    val df = items.toDF("id", "w")
    // driver reference: exclusive prefix sums in id order, positions from
    // the same hash
    val pos = items.filter(_._2 > 0)
      .scanLeft((-1L, 0L, 0L)) { case ((_, _, cum), (id, w)) => (id, w, cum + w) }
      .drop(1).map { case (id, w, cumEnd) => (id, w, cumEnd - w, cumEnd) }
    val total = pos.last._4
    val expected = (1L to 30L).map { j =>
      val p = hash60(s"r:$j") % total
      val hit = pos.find(e => p >= e._3 && p < e._4).get
      (j, hit._1, hit._2)
    }.toSet
    val got = Sampling.weightedSampleReplacement(df, "id", "w", k = 30, salt = "r")
      .as[(Long, Long, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    assert(got == expected)
    assert(got.size == 30, "every draw lands on exactly one row")
    // with replacement: at least one id drawn more than once at this k/N
    assert(expected.groupBy(_._2).exists(_._2.size > 1),
      "fixture sanity: the salt should produce a repeat draw")
  }

  test("weightedSampleReplacement is partition-independent and empty-safe") {
    val df = (0L until 120L).map(i => (i, i % 3 + 1)).toDF("id", "w")
    val one = Sampling.weightedSampleReplacement(df, "id", "w", 15, "p")
      .as[(Long, Long, Long)].collect().toSet
    val many = Sampling.weightedSampleReplacement(df.repartition(11), "id", "w", 15, "p")
      .as[(Long, Long, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    assert(one == many)
    val empty = Sampling.weightedSampleReplacement(
      Seq.empty[(Long, Long)].toDF("id", "w"), "id", "w", 5, "p")
    assert(empty.count() == 0L)
    graft.Storage.releaseAll(spark)
  }

  test("temperatureResample flattens skew toward p^alpha: tail keeps all, head is cut") {
    // strata sized 640 / 160 / 40 (16:4:1); alpha = 0.5 rates anchor on
    // the smallest: sqrt(40/640) = 0.25, sqrt(40/160) = 0.5, 1.0 — kept
    // shares go to ~4:2:1 = p^0.5
    val rows = (0L until 640L).map(i => (s"a$i", "big")) ++
      (0L until 160L).map(i => (s"b$i", "mid")) ++
      (0L until 40L).map(i => (s"c$i", "small"))
    val df = rows.toDF("id", "s")
    val kept = Sampling.temperatureResample(df, "id", "s", alpha = 0.5, salt = "t5")
      .as[(String, String)].collect()
    val byS = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byS("small") == 40, "smallest stratum keeps every row")
    // exact driver replay of threshold + hash membership
    def expectKept(stratum: String, thr: Long): Int =
      rows.filter(_._2 == stratum).count(r => hash60(s"t5:${r._1}") % 10000 < thr)
    assert(byS("big") == expectKept("big", 2500))
    assert(byS("mid") == expectKept("mid", 5000))
    // flattening: kept-count ratio compresses from 16:1 toward 4:1
    val keptRatio = byS("big").toDouble / byS("small")
    assert(keptRatio < 6.0 && keptRatio > 2.0, s"ratio $keptRatio")
    // partition independence
    val repart = Sampling.temperatureResample(df.repartition(13), "id", "s",
      alpha = 0.5, salt = "t5").as[(String, String)].collect().toSet
    assert(repart == kept.toSet)
  }

  test("temperatureResample at alpha=1 is the natural distribution; bad alpha rejected") {
    val rows = (0L until 100L).map(i => (s"a$i", "x")) ++
      (0L until 50L).map(i => (s"b$i", "y"))
    val df = rows.toDF("id", "s")
    val kept = Sampling.temperatureResample(df, "id", "s", alpha = 1.0, salt = "t1")
      .as[(String, String)].collect()
    assert(kept.length == 150, "alpha = 1 resamples nothing")
    intercept[IllegalArgumentException] {
      Sampling.temperatureResample(df, "id", "s", alpha = 0.0)
    }
  }

  test("capPerGroup enforces the quota, keeps small groups whole, and a larger cap extends the kept set") {
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
      .union(Seq((1000L, "tiny"), (1001L, "tiny")).toDF("id", "g"))
    val kept = Sampling.capPerGroup(df, Seq("g"), "id", cap = 20)
    val byGroup = kept.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("g0" -> 20L, "g1" -> 20L, "g2" -> 20L, "tiny" -> 2L))
    assert(kept.agg(max("rank_in_group")).head.getLong(0) == 20L)

    // Determinism + prefix property: cap=20 survivors ⊂ cap=30 survivors,
    // with identical ranks.
    val small = kept.select("id", "rank_in_group")
      .as[(Long, Long)].collect().toMap
    val large = Sampling.capPerGroup(df, Seq("g"), "id", cap = 30)
      .select("id", "rank_in_group").as[(Long, Long)].collect().toMap
    assert(small.forall { case (id, rk) => large.get(id).contains(rk) })

    // Hash order, not id order: the kept set is not just the lowest ids.
    assert(!small.keySet.filterNot(_ >= 1000L).forall(_ < 60L))
  }

  test("stratifiedSample draws exactly k per stratum, independent of partitioning") {
    val df = (1 to 200).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val s1 = Sampling.stratifiedSample(df, "grp", "id", 10)
    val counts = s1.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 10L, "b" -> 10L))
    // membership is a function of (salt, id) order only — not of how the
    // input happened to be partitioned
    val s2 = Sampling.stratifiedSample(df.repartition(7), "grp", "id", 10)
    assert(s1.select("id").as[Long].collect().toSet ==
      s2.select("id").as[Long].collect().toSet)
    // a different salt re-deals the draw
    val s3 = Sampling.stratifiedSample(df, "grp", "id", 10, salt = "other")
    assert(s1.select("id").as[Long].collect().toSet !=
      s3.select("id").as[Long].collect().toSet)
    // strata smaller than k survive whole
    val small = Seq((1L, "x"), (2L, "x")).toDF("id", "grp")
    assert(Sampling.stratifiedSample(small, "grp", "id", 10).count() == 2)
  }

  test("assembleToBudget: budget math, strict fit, and exclusion of unweighted sources") {
    assert(Sampling.budgetsFor(Seq("a" -> 4.0, "b" -> 2.0, "c" -> 1.0, "d" -> 1.0), 6000L)
      == Seq("a" -> 3000L, "b" -> 1500L, "c" -> 750L, "d" -> 750L))
    val docs = (1 to 120).map { i =>
      val src = Seq("a", "b", "c")(i % 3)
      (i.toLong, src, 40L + i % 7)   // ~40-46 cost units each
    }.toDF("id", "source", "cost")
    val got = Sampling.assembleToBudget(docs, "id", "cost", "source",
      Seq("a" -> 2.0, "b" -> 1.0), totalBudget = 900L)
      .as[(Long, String, Long)].collect()
    // weighted sources only, and the inclusive running total never overshoots
    val perSource = got.groupBy(_._2)
    assert(perSource.keySet == Set("a", "b"))
    assert(perSource("a").map(_._3).max <= 600L)   // 2/3 × 900
    assert(perSource("b").map(_._3).max <= 300L)   // 1/3 × 900
    // strict fit: each source's next-in-hash-order doc would have overshot,
    // i.e. the kept sets are maximal prefixes (cum_cost is the running sum)
    perSource.values.foreach { rows =>
      val cums = rows.map(_._3).sorted
      assert(cums.zip(cums.tail).forall { case (x, y) => y > x })
    }
    // selection is a pure function of (salt, id): partitioning can't move it
    val again = Sampling.assembleToBudget(docs.repartition(7), "id", "cost",
      "source", Seq("a" -> 2.0, "b" -> 1.0), totalBudget = 900L)
      .as[(Long, String, Long)].collect()
    assert(got.toSet == again.toSet)
  }

  test("largest-remainder allocation: exact budget, remainder order, ties") {
    // counts 5/3/2 over budget 7: quotas 3.5/2.1/1.4 → bases 3/2/1
    // (sum 6), one leftover goes to the largest remainder (a: .5)
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val got = Sampling.largestRemainderAllocation(
        rows.toDF("source"), "source", budget = 7L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map("a" -> ((5L, 4L)), "b" -> ((3L, 2L)), "c" -> ((2L, 1L))))
    assert(got.values.map(_._2).sum == 7L)

    // equal counts, budget 5 over 3 groups: bases 1 each, remainders
    // tie — the two leftovers go to the SMALLEST group keys
    val eq = Sampling.largestRemainderAllocation(
        Seq("a", "a", "b", "b", "c", "c").toDF("source"), "source",
        budget = 5L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(eq == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("largest-remainder allocation sums to the budget on skewed counts") {
    val rows = (1 to 997).map(i => s"s${i % 13}")
    val got = Sampling.largestRemainderAllocation(
        rows.toDF("source"), "source", budget = 100L)
      .as[(String, Long, Long)].collect()
    assert(got.map(_._3).sum == 100L)
    assert(got.length == 13)
    // proportionality within one unit of the exact quota
    got.foreach { case (_, n, alloc) =>
      val quota = 100.0 * n / 997.0
      assert(math.abs(alloc - quota) < 1.0, s"alloc $alloc quota $quota")
    }
  }
}
