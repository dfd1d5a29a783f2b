package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HilbertSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("withHilbert matches the driver reference and is bijective on a full grid") {
    val pts = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)).toDF("x", "y")
    val got = Hilbert.withHilbert(pts, col("x"), col("y"), bits = 4, "h")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h == Hilbert.hilbertIndex(x, y, 4), s"($x,$y)")
    }
    assert(got.map(_._3).sorted.toSeq == (0L until 256L))
  }

  test("consecutive curve positions are ALWAYS grid neighbors — the property Z-order lacks") {
    val bits = 5
    val n = 1L << bits
    val byD = (for (x <- 0L until n; y <- 0L until n)
      yield (Hilbert.hilbertIndex(x, y, bits), (x, y))).sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
    // Z-order on the same grid DOES jump (e.g. (1,1)->(2,0) at d=3->4)
    def morton(x: Long, y: Long): Long =
      (for (i <- 0 until bits) yield (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val zByD = (for (x <- 0L until n; y <- 0L until n)
      yield (morton(x, y), (x, y))).sortBy(_._1).map(_._2)
    val zJumps = zByD.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1 }
    assert(zJumps > 0, "sanity: the Z-curve jumps where Hilbert does not")
  }

  test("hilbert clustering prunes on the NON-leading dimension where a lex sort cannot") {
    val n = 32L
    val pts = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    // partitions whose [min_y, max_y] intersects the y-band [0, 3] — the
    // file-skipping question a scan filtered on y asks of the min/max stats
    def hitPartitions(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min("y").as("ymin"), max("y").as("ymax"))
        .filter(col("ymin") <= 3 && col("ymax") >= 0)
        .count()
    val hHits = hitPartitions(
      Hilbert.clusterByHilbert(pts, col("x"), col("y"), bits = 5, numPartitions = 16))
    val lexHits = hitPartitions(
      pts.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y")))
    // every lex stripe spans all of y → every partition intersects the
    // band; Hilbert tiles confine y, so only the bottom row of tiles does
    assert(lexHits == 16L, s"sanity: lex stripes span y, got $lexHits")
    assert(hHits <= 8L, s"hilbert should confine y per partition, got $hHits")
  }

  test("the staged unroll stays linear in bits — no exponential expression blowup") {
    val pts = Seq((1L, 2L)).toDF("x", "y")
    val plan16 = Hilbert.withHilbert(pts, col("x"), col("y"), bits = 16, "h")
      .queryExecution.optimizedPlan.toString
    // an inlined unroll triples per level (3 consumers of x/y each): 3^16
    // CASEs would OOM long before printing; a staged plan holds ~5/level
    val cases = "CASE WHEN".r.findAllIn(plan16).size
    assert(cases <= 16 * 8, s"expression blowup: $cases CASE nodes")
  }

  test("sql replay agrees with the Spark column (string-compare on the reference)") {
    // cross-engine parity is the oracle's job (q85); here pin that the
    // generated SQL's reference walk and the Spark walk agree shape-wise
    // via the driver reference at several widths
    for (bits <- Seq(1, 2, 3, 8); x <- Seq(0L, 1L, 5L); y <- Seq(0L, 3L)) {
      if (x < (1L << bits) && y < (1L << bits)) {
        val got = Hilbert.withHilbert(Seq((x, y)).toDF("x", "y"),
          col("x"), col("y"), bits, "h").select("h").as[Long].head()
        assert(got == Hilbert.hilbertIndex(x, y, bits), s"bits=$bits ($x,$y)")
      }
    }
  }

  test("input guards") {
    intercept[IllegalArgumentException] {
      Hilbert.withHilbert(Seq((1L, 1L)).toDF("x", "y"), col("x"), col("y"), 0, "h")
    }
    intercept[IllegalArgumentException] {
      Hilbert.withHilbert(Seq((1L, 1L)).toDF("x", "y"), col("x"), col("y"), 32, "h")
    }
  }

  test("n-D reference is bijective with unit-step adjacency (n = 2, 3, 4)") {
    for (n <- 2 to 4; bits <- 2 to (if (n == 2) 4 else 2)) {
      val side = 1 << bits
      val total = math.pow(side, n).toInt
      val byIndex = new Array[Seq[Long]](total)
      def loop(dims: Int, acc: List[Long]): Unit =
        if (dims == 0) {
          val c = acc.reverse
          val h = Hilbert.hilbertIndexN(c, bits)
          assert(h >= 0 && h < total, s"n=$n bits=$bits out of range: $h")
          assert(byIndex(h.toInt) == null, s"n=$n bits=$bits collision at $h")
          byIndex(h.toInt) = c
        } else (0 until side).foreach(v => loop(dims - 1, v.toLong :: acc))
      loop(n, Nil)
      (1 until total).foreach { i =>
        val d = byIndex(i - 1).zip(byIndex(i)).map { case (u, v) => math.abs(u - v) }.sum
        assert(d == 1, s"n=$n bits=$bits: jump of $d between ${i - 1} and $i")
      }
    }
  }

  test("n-D column walk matches the driver reference on random points") {
    val rnd = new scala.util.Random(61)
    for (n <- Seq(3, 4); bits <- Seq(2, 5)) {
      val pts: Seq[Seq[Long]] =
        Seq.fill(40)(Seq.fill(n)(rnd.nextInt(1 << bits).toLong))
      val df = pts.zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toDF("id", "cs")
      val coords = (0 until n).map(i => element_at(col("cs"), i + 1))
      val got = Hilbert.withHilbertN(df, coords, bits, "h")
        .select("id", "h").as[(Long, Long)].collect().toMap
      pts.zipWithIndex.foreach { case (c, i) =>
        assert(got(i.toLong) == Hilbert.hilbertIndexN(c, bits),
          s"n=$n bits=$bits point=$c")
      }
    }
  }

  test("n-D walk at n=2 is itself a valid Hilbert curve (adjacency via the column form)") {
    // The Skilling orientation differs from the 2-D xy2d walk's — both are
    // Hilbert curves; pin the property, not cross-variant equality.
    val bits = 3
    val side = 1 << bits
    val df = (for (x <- 0 until side; y <- 0 until side)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val got = Hilbert.withHilbertN(df, Seq(col("x"), col("y")), bits, "h")
      .select("h", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 until side * side).map(_.toLong))
    got.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(a._2 - b._2) + math.abs(a._3 - b._3) == 1)
    }
  }
}
