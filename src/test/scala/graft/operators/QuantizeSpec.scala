package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(0.0f, 0.5f, 1.0f)),
    (2L, Seq(-2.0f, 0.0f, 2.0f, 1.0f)),
    (3L, Seq(7.0f, 7.0f, 7.0f)),       // constant vector: all-zero codes
    (4L, Seq(3.25f)),                  // single element: vmax == vmin
  ).toDF("vec_id", "embedding")

  private def quantized =
    Quantize.quantizeInt8(vecs, "embedding")
      .select(col("vec_id"), col("vmin"), col("vmax"), col("codes"))
      .as[(Long, Double, Double, Seq[Long])].collect()
      .map(r => r._1 -> r).toMap

  test("codes span 0..255 with extremes mapped to the ends") {
    val q = quantized
    assert(q(1L)._4 == Seq(0L, 127L, 255L)) // 0.5 → floor(127.5) = 127
    assert(q(2L)._4.head == 0L && q(2L)._4(2) == 255L)
    assert(q(2L)._2 == -2.0 && q(2L)._3 == 2.0)
  }

  test("constant vectors quantize to all-zero codes (no division by zero)") {
    val q = quantized
    assert(q(3L)._4 == Seq(0L, 0L, 0L))
    assert(q(4L)._4 == Seq(0L))
  }

  test("every code is in [0, 255] and reconstruction error is bounded") {
    val rows = Quantize.quantizeInt8(vecs, "embedding")
      .select(col("embedding").cast("array<double>"), col("vmin"), col("vmax"),
        col("codes"),
        Quantize.dequantizeInt8(col("codes"), col("vmin"), col("vmax")).as("recon"))
      .as[(Seq[Double], Double, Double, Seq[Long], Seq[Double])].collect()
    rows.foreach { case (orig, vmin, vmax, codes, recon) =>
      assert(codes.forall(c => c >= 0L && c <= 255L))
      val step = (vmax - vmin) / 255.0
      orig.zip(recon).foreach { case (o, r) =>
        assert(math.abs(o - r) <= step + 1e-12, s"orig=$o recon=$r step=$step")
      }
    }
  }

  test("non-finite vectors take the degenerate bucket: null bounds, zero codes") {
    // Without the guard, one NaN poisons vmax; Spark casts the NaN code to
    // 0 while DuckDB's CAST(NaN AS BIGINT) errors — a replaying oracle
    // would crash instead of diverging visibly.
    val poisoned = Seq(
      (1L, Seq(0.0f, Float.NaN, 1.0f)),
      (2L, Seq(Float.PositiveInfinity, 0.0f)),
      (3L, Seq(0.0f, 1.0f)),             // control: finite row unaffected
    ).toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(poisoned, "embedding")
      .select(col("vec_id"), col("vmin"), col("vmax"), col("codes"))
      .as[(Long, Option[Double], Option[Double], Seq[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(q(1L)._2.isEmpty && q(1L)._3.isEmpty && q(1L)._4 == Seq(0L, 0L, 0L))
    assert(q(2L)._2.isEmpty && q(2L)._3.isEmpty && q(2L)._4 == Seq(0L, 0L))
    assert(q(3L)._2.contains(0.0) && q(3L)._3.contains(1.0) &&
      q(3L)._4 == Seq(0L, 255L))
  }

  test("codeChecksum is order-sensitive") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L)),
      (2L, Seq(3L, 2L, 1L)),
      (3L, Seq(1L, 2L, 3L)),
    ).toDF("id", "codes")
    val sums = df.select(col("id"), Quantize.codeChecksum(col("codes")).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(sums(1L) == sums(3L))
    assert(sums(1L) != sums(2L))
  }

  test("quantization is per-row work only: no Exchange in the plan") {
    val plan = Quantize.quantizeInt8(vecs, "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
