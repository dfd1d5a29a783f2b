package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AMS invariants: counters are partition-invariant commutative sums,
  * the exact columns match brute recomputations, estimates land inside
  * a loose concentration envelope (and the estimator is unbiased enough
  * to beat a trivial guess), and disjoint join domains estimate near
  * zero against an exact zero. Independent end-to-end check: the
  * q144/q145 oracles replay counters, estimates, and the median pick.
  */
class AmsSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // zipf-ish: value v appears ~ 600/v times — skewed, F2 dominated by head
  private lazy val skewed: Seq[String] =
    (1 to 40).flatMap(v => Seq.fill(600 / v)(s"v$v"))

  test("counters are bit-identical across partitionings") {
    val df = skewed.toDF("tok")
    def cs(parts: Int) = AmsSketch.counters(df.repartition(parts), "tok", 5, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cs(1) == cs(32))
  }

  test("f2: exact column is Σ freq², estimate within the envelope") {
    val df = skewed.toDF("tok")
    val exact = skewed.groupBy(identity).map(_._2.size.toLong)
      .map(n => n * n).sum
    val row = AmsSketch.f2(df, "tok", depth = 5, width = 256).head()
    assert(row.getLong(1) == exact)
    val est = row.getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.5,
      s"estimate $est too far from exact $exact")
  }

  test("joinSize: exact inner product; estimate tracks it") {
    val a = (1 to 30).flatMap(v => Seq.fill(v)(s"u$v")).toDF("k")
    val b = (11 to 40).flatMap(v => Seq.fill(41 - v)(s"u$v")).toDF("k")
    val exact = (11 to 30).map(v => v.toLong * (41 - v)).sum
    val row = AmsSketch.joinSize(a, "k", b, "k", depth = 5, width = 256).head()
    assert(row.getLong(1) == exact)
    val est = row.getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.5,
      s"estimate $est too far from exact $exact")
  }

  test("disjoint join domains: exact 0, estimate near zero") {
    val a = (1 to 20).flatMap(v => Seq.fill(5)(s"a$v")).toDF("k")
    val b = (1 to 20).flatMap(v => Seq.fill(5)(s"b$v")).toDF("k")
    val row = AmsSketch.joinSize(a, "k", b, "k", depth = 5, width = 256).head()
    assert(row.getLong(1) == 0L)
    // variance scale is ~ sqrt(F2a·F2b/width) = sqrt(500·500/256) ≈ 31
    assert(math.abs(row.getLong(0)) < 200L, s"est ${row.getLong(0)}")
  }

  test("depth rows with no overlapping cells rank as zero (spine pad)") {
    val a = Seq("x").toDF("k")
    val b = Seq("y").toDF("k")
    val row = AmsSketch.joinSize(a, "k", b, "k", depth = 5, width = 256).head()
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L)
  }

  test("refuses an even depth") {
    intercept[IllegalArgumentException] {
      AmsSketch.f2(skewed.toDF("tok"), "tok", depth = 4, width = 64)
    }
  }
}
