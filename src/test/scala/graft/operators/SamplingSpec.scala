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
}
