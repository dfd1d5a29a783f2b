package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch invariants: exact below k, estimator accuracy above k,
  * bit-identical results under repartitioning (the k smallest distinct
  * hashes are a pure function of the value set), set-algebra
  * intersection in both the exhaustive and estimated regimes, and the
  * sketch-sized-exchange plan shape.
  */
class KmvSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("below k the sketch is exhaustive: estimate equals the exact count") {
    val df = (1 to 500).map(i => ("g", s"v${i % 100}")).toDF("g", "v")
    val r = KmvSketch.distinctByGroup(df, Seq("g"), "v", k = 256, withExact = true)
      .head()
    assert(r.getDouble(1) == 100.0 && r.getLong(2) == 100L)
  }

  test("above k the estimator lands within the KMV error envelope") {
    val df = (1 to 60000).map(i => ("g", s"item-${i % 10000}")).toDF("g", "v")
    val r = KmvSketch.distinctByGroup(df, Seq("g"), "v", k = 256, withExact = true)
      .head()
    val est = r.getDouble(1)
    assert(r.getLong(2) == 10000L)
    // 3.5 standard errors at k=256 ≈ 22%
    assert(math.abs(est - 10000.0) / 10000.0 < 0.22, s"estimate $est")
  }

  test("estimates are bit-identical across partitionings and merge trees") {
    val rows = (1 to 20000).map(i => (s"g${i % 3}", s"tok-${(i * 7) % 4000}"))
    val one = KmvSketch.distinctByGroup(
        rows.toDF("g", "v").repartition(1), Seq("g"), "v", k = 128)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val many = KmvSketch.distinctByGroup(
        rows.toDF("g", "v").repartition(32), Seq("g"), "v", k = 128)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(one == many)
  }

  test("intersection: exhaustive regime is exact set intersection") {
    val a = (0 until 80).map(i => ("A", s"k$i"))
    val b = (50 until 150).map(i => ("B", s"k$i"))
    val m = KmvSketch.intersectionMatrix((a ++ b).toDF("g", "v"), "g", "v", k = 256)
      .head()
    assert(m.getString(0) == "A" && m.getString(1) == "B")
    assert(m.getDouble(2) == 30.0, "|{50..79}| exactly — both sketches exhaustive")
  }

  test("intersection: estimated regime lands near the true overlap") {
    val a = (0 until 10000).map(i => ("A", s"x$i"))
    val b = (5000 until 15000).map(i => ("B", s"x$i"))
    val m = KmvSketch.intersectionMatrix((a ++ b).toDF("g", "v"), "g", "v", k = 256)
      .head()
    val est = m.getDouble(2)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.35, s"estimate $est")
  }

  test("disjoint sets estimate zero intersection") {
    val a = (0 until 5000).map(i => ("A", s"a$i"))
    val b = (0 until 5000).map(i => ("B", s"b$i"))
    val m = KmvSketch.intersectionMatrix((a ++ b).toDF("g", "v"), "g", "v", k = 128)
      .head()
    assert(m.getDouble(2) == 0.0)
  }

  test("the exchange is sketch-sized: partial kmv aggregation map-side") {
    val df = (1 to 1000).map(i => ("g", s"v$i")).toDF("g", "v")
    val p = KmvSketch.distinctByGroup(df, Seq("g"), "v", k = 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_kmv_minima"), p.take(1500))
  }
}
