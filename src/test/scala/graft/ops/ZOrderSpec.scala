package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Plain-Scala Morton reference. */
  private def morton(xs: Seq[Long], bits: Int): Long =
    (for { i <- 0 until bits; (x, k) <- xs.zipWithIndex }
      yield ((x >> i) & 1L) << (i * xs.size + k)).sum

  test("zValue matches the bit-interleave reference over a full grid") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == morton(Seq(x, y), 4), s"($x,$y)") }
    // bijective on the grid: 256 distinct z-values covering 0..255
    assert(got.map(_._3).sorted.toSeq == (0L until 256L))
  }

  test("three-column interleave places each column's bits at stride 3") {
    val got = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 1)).as[Long].head()
    assert(got == 7L) // 1 + 2 + 4: bit 0 of each column at positions 0,1,2
  }

  test("z-clustering bounds BOTH dimensions per partition where a lex sort cannot") {
    val n = 32L
    val pts = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    def partitionArea(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .agg(sum("area")).as[Long].head()
    val zArea = partitionArea(
      ZOrder.clusterByZ(pts, Seq(col("x"), col("y")), bits = 5, numPartitions = 16))
    val lexArea = partitionArea(
      pts.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y")))
    // Bounding-box AREA alone can't separate the layouts (16 aligned 8×8
    // z-tiles and 16 width-2 full-height lex stripes both sum to 1024 on
    // a 32×32 grid); the discriminating metric is the second dimension's
    // per-partition RANGE — a scan filtered on y alone must read every
    // lex stripe, but skips most z-tiles.
    val yRanges = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max("y") - min("y") + 1).as("yr"))
        .agg(sum("yr")).as[Long].head()
    val zY = yRanges(
      ZOrder.clusterByZ(pts, Seq(col("x"), col("y")), bits = 5, numPartitions = 16))
    val lexY = yRanges(
      pts.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y")))
    assert(zY < lexY,
      s"z-order should bound y per partition: zY=$zY lexY=$lexY " +
        s"(areas: z=$zArea lex=$lexArea)")
  }

  test("input domain and width guards") {
    intercept[IllegalArgumentException](ZOrder.zValue(Seq(col("x")), 63))
    intercept[IllegalArgumentException](ZOrder.zValue(Seq.empty, 4))
  }
}
