package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-moment Pearson matrix: algebraically pinned endpoints (±1 on
  * perfectly linear data are EXACT, not approximate, because the finish is
  * num/√(num²) over exact integer moments), null on zero variance,
  * closeness to Spark's built-in corr on varied data, and the
  * one-scan/one-shuffle plan shape.
  */
class CorrelationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("perfectly linear measures correlate at exactly ±1.0") {
    val df = (1 to 40).map(i => (i.toLong, 2L * i, 10L - i)).toDF("x", "y", "z")
    val out = Correlation.matrixExact(df, Seq(
        "x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("x", "y")) == 1.0)
    assert(out(("x", "z")) == -1.0)
    assert(out(("y", "z")) == -1.0)
  }

  test("zero-variance measure yields null, not an IEEE edge case") {
    val df = (1 to 10).map(i => (i.toLong, 7L)).toDF("x", "c")
    val rows = Correlation.matrixExact(df, Seq("x" -> col("x"), "c" -> col("c")))
      .collect()
    assert(rows.length == 1 && rows(0).isNullAt(3))
    assert(rows(0).getLong(2) == 10L)
  }

  test("agrees with Spark's built-in corr on varied integer data") {
    val df = (0 until 500).map { i =>
      (((i * 37) % 101).toLong, ((i * 53 + i * i) % 89).toLong)
    }.toDF("a", "b")
    val exact = Correlation.matrixExact(df, Seq("a" -> col("a"), "b" -> col("b")))
      .head().getDouble(3)
    val builtin = df.agg(corr(col("a").cast("double"), col("b").cast("double")))
      .head().getDouble(0)
    assert(math.abs(exact - builtin) < 1e-12, s"$exact vs $builtin")
  }

  test("pair order follows the declared measure order") {
    val df = Seq((1L, 2L, 3L)).toDF("p", "q", "r")
    val pairs = Correlation.matrixExact(df,
        Seq("p" -> col("p"), "q" -> col("q"), "r" -> col("r")))
      .select("col_x", "col_y").collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSeq == Seq(("p", "q"), ("p", "r"), ("q", "r")))
  }

  test("one scan: a single partial-aggregated exchange, no join, no second read") {
    val df = (1 to 100).map(i => (i.toLong, (i * 3 % 7).toLong)).toDF("x", "y")
    val p = Correlation.matrixExact(df, Seq("x" -> col("x"), "y" -> col("y")))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p.take(1200))
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(1200))
    assert(!p.contains("Join"), p.take(1200))
  }
}
