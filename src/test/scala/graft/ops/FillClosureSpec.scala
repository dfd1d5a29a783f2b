package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FillClosureSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fillFixture = Seq(
    ("u1", 1, None: Option[Double]),
    ("u1", 2, Some(10.0)),
    ("u1", 3, None),
    ("u1", 4, Some(20.0)),
    ("u2", 1, None),
  ).toDF("k", "seq", "v")

  test("Fill.down carries last observation forward within partition") {
    val out = Fill.down(fillFixture, Seq("v"), Seq("k"), Seq(col("seq")))
      .orderBy("k", "seq").select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(None, Some(10.0), Some(10.0), Some(20.0), None))
  }

  test("Fill.up carries next observation backward within partition") {
    val out = Fill.up(fillFixture, Seq("v"), Seq("k"), Seq(col("seq")))
      .orderBy("k", "seq").select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(10.0), Some(10.0), Some(20.0), Some(20.0), None))
  }

  test("Fill.upDown fills every gap (u2 stays null: nothing to copy)") {
    val out = Fill.upDown(fillFixture, Seq("v"), Seq("k"), Seq(col("seq")))
      .orderBy("k", "seq").select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(10.0), Some(10.0), Some(20.0), Some(20.0), None))
  }

  private def resolveMap(edges: Seq[(String, String)], nodes: Seq[String]): Map[String, Set[(String, Int)]] = {
    val n = nodes.toDF("node")
    val e = edges.toDF("src", "dst")
    Closure.resolve(n, e).collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(r => (r.getString(1), r.getInt(2))).toSet }
  }

  test("Closure resolves multi-hop chains with hop counts") {
    val r = resolveMap(Seq("a" -> "b", "b" -> "c", "x" -> "c"), Seq("a", "b", "c", "d", "x"))
    assert(r("a") == Set(("c", 2)))
    assert(r("b") == Set(("c", 1)))
    assert(r("c") == Set(("c", 0)))
    assert(r("d") == Set(("d", 0)))
    assert(r("x") == Set(("c", 1)))
  }

  test("Closure multiplies rows on splits (reference unnest semantics)") {
    val r = resolveMap(Seq("a" -> "b", "a" -> "c", "b" -> "d"), Seq("a"))
    assert(r("a") == Set(("d", 2), ("c", 1)))
  }

  test("Closure re-keying is idempotent: resolving resolved codes is a no-op") {
    val edges = Seq("a" -> "b", "b" -> "c")
    val first = resolveMap(edges, Seq("a", "b", "c"))
    val finals = first.values.flatten.map(_._1).toSeq.distinct
    val second = resolveMap(edges, finals)
    assert(second.forall { case (k, v) => v == Set((k, 0)) })
  }

  test("Closure rejects cyclic successor data instead of diverging") {
    assertThrows[IllegalArgumentException] {
      resolveMap(Seq("a" -> "b", "b" -> "a"), Seq("a"))
    }
  }

  test("Closure with deep chain resolves in logarithmic iterations") {
    // chain of 1000: 0→1→...→1000; pointer doubling must converge well
    // within the 30-iteration bound (needs ~10 doublings)
    val edges = (0 until 1000).map(i => (s"n$i", s"n${i + 1}"))
    val r = resolveMap(edges, Seq("n0", "n500"))
    assert(r("n0") == Set(("n1000", 1000)))
    assert(r("n500") == Set(("n1000", 500)))
  }
}
