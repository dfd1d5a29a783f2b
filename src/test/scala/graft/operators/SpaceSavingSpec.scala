package graft.operators

import graft.SparkSpec
import graft.functions.SpaceSavingBuffer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class SpaceSavingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: token t_i appears ~n/i times — a few heavies, a
    * long tail.
    */
  private def zipf(n: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      val r = rnd.nextDouble()
      // inverse-CDF-ish draw over ranks 1..1000
      val rank = math.max(1, math.min(1000, math.exp(r * math.log(1000)).toInt))
      s"t$rank"
    }
  }

  test("per-key bounds hold: est−err ≤ true ≤ est, for every tracked token") {
    val toks = zipf(20000, 3)
    val truth = toks.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val got = SpaceSaving.topK(toks.toDF("token"), "token", m = 64)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length <= 64)
    got.foreach { case (tok, est, err, _) =>
      val t = truth.getOrElse(tok, 0L)
      assert(t <= est, s"$tok: true $t > est $est")
      assert(est - err <= t, s"$tok: est-err ${est - err} > true $t")
    }
  }

  test("coverage: every token with true count > delta is tracked") {
    val toks = zipf(20000, 5)
    val truth = toks.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val rows = SpaceSaving.topK(toks.toDF("token"), "token", m = 64)
      .as[(String, Long, Long, Long)].collect()
    val delta = rows.head._4
    val tracked = rows.map(_._1).toSet
    truth.foreach { case (tok, n) =>
      if (n > delta) assert(tracked.contains(tok), s"$tok true=$n > delta=$delta untracked")
    }
    // the blind spot must be genuinely small relative to the corpus
    assert(delta <= 2L * 20000L / 64L + 1L, s"delta $delta exceeds ~2N/m")
  }

  test("bounds survive arbitrary merge trees (partitioning invariance of the guarantees)") {
    val toks = zipf(30000, 7)
    val truth = toks.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    Seq(1, 4, 13).foreach { parts =>
      val rows = SpaceSaving.topK(
        toks.toDF("token").repartition(parts), "token", m = 96)
        .as[(String, Long, Long, Long)].collect()
      val delta = rows.head._4
      val tracked = rows.map(_._1).toSet
      rows.foreach { case (tok, est, err, _) =>
        val t = truth.getOrElse(tok, 0L)
        assert(t <= est && est - err <= t, s"parts=$parts $tok est=$est err=$err true=$t")
      }
      truth.foreach { case (tok, n) =>
        if (n > delta) assert(tracked.contains(tok), s"parts=$parts $tok")
      }
    }
  }

  test("heavyHittersExact equals the plain exact groupBy, under any partitioning") {
    val toks = zipf(25000, 11)
    val df = toks.toDF("token")
    val want = toks.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      .filter { case (_, n) => n >= math.max(1L, math.ceil(0.02 * toks.size).toLong) }
    Seq(1, 8).foreach { parts =>
      val got = SpaceSaving.heavyHittersExact(
        df.repartition(parts), "token", phi = 0.02, m = 256)
        .as[(String, Long)].collect().toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("a too-small m fails loudly instead of silently missing heavy hitters") {
    // near-uniform tokens: delta ≈ N/m stays above any phi·N for tiny m
    val toks = (0 until 5000).map(i => s"u${i % 400}")
    val e = intercept[IllegalArgumentException] {
      SpaceSaving.heavyHittersExact(toks.toDF("token"), "token",
        phi = 0.001, m = 8)
    }
    assert(e.getMessage.contains("blind spot"))
  }

  test("null tokens are skipped; empty input yields an empty summary and no hitters") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("token")
    val rows = SpaceSaving.topK(df, "token", m = 4)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.toSeq == Seq(("a", 2L, 0L, 0L)))
    val empty = Seq.empty[String].toDF("token")
    assert(SpaceSaving.heavyHittersExact(empty, "token", 0.05, 16).count() == 0)
    assert(SpaceSaving.topK(empty, "token", 16).count() == 0)
  }

  test("driver buffer: exact when distinct ≤ m; eviction inherits the min slot") {
    val b = new SpaceSavingBuffer(3)
    Seq("a", "b", "a", "c", "a", "b").foreach(b.add)
    val exact = b.sortedEntries.map { case (t, v) => (t, v(0), v(1)) }.toSeq
    assert(exact == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
    assert(b.delta == 0L)
    // full summary: "d" evicts the min (c, est 1) and inherits its mass
    b.add("d")
    val after = b.sortedEntries.map { case (t, v) => t -> ((v(0), v(1))) }.toMap
    assert(after("d") == ((2L, 1L)))
    assert(!after.contains("c"))
    assert(b.delta == 1L)
  }

  test("the build is summary-sized through the exchange (one partial per task)") {
    // plan shape: partial space_saving below the single-partition
    // exchange, no raw-token shuffle
    val df = zipf(5000, 13).toDF("token").repartition(4)
    val plan = SpaceSaving.summary(df, "token", 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_space_saving") || plan.contains("space_saving"),
      plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
