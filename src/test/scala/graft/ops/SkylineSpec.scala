package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class SkylineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val pts = rows.groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
    pts.filter { case (x, y, _) =>
      !pts.exists { case (x2, y2, _) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet
  }

  private def run(rows: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val got = Skyline.paretoFront2D(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    got
  }

  test("hand case: dominated points drop, ties on one axis resolve by the other") {
    // (5,1),(3,3),(1,5) are the front; (3,2) dominated by (3,3);
    // (5,1) twice → n_rows 2; (2,3) dominated by (3,3)
    val rows = Seq[(Long, Long)](
      (5, 1), (5, 1), (3, 3), (1, 5), (3, 2), (2, 3), (1, 1))
    assert(run(rows) == Set((5L, 1L, 2L), (3L, 3L, 1L), (1L, 5L, 1L)))
  }

  test("single point, identical points, and a totally-ordered chain") {
    assert(run(Seq((7L, 7L))) == Set((7L, 7L, 1L)))
    assert(run(Seq((2L, 2L), (2L, 2L), (2L, 2L))) == Set((2L, 2L, 3L)))
    // chain: only the top survives
    assert(run((1L to 20L).map(i => (i, i))) == Set((20L, 20L, 1L)))
  }

  test("matches brute force on random points, including negatives") {
    val rnd = new Random(13)
    val rows = Seq.fill(500)((rnd.nextInt(40).toLong - 20L,
      rnd.nextInt(40).toLong - 20L))
    assert(run(rows) == brute(rows))
  }

  test("matches brute force when many points share the max of one axis") {
    val rnd = new Random(29)
    val rows = Seq.fill(200)((rnd.nextInt(5).toLong, rnd.nextInt(100).toLong)) ++
      Seq.fill(50)((4L, 99L)) // heavy tie at a front corner
    assert(run(rows) == brute(rows))
  }

  private def bruteKD(rows: Seq[Seq[Long]]): Set[(Seq[Long], Long)] = {
    val pts = rows.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    pts.filter { case (p, _) =>
      !pts.keys.exists(q =>
        q.zip(p).forall { case (a, b) => a >= b } && q != p)
    }.toSet
  }

  private def runKD(rows: Seq[Seq[Long]], d: Int,
                    parts: Int = 4): Set[(Seq[Long], Long)] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(org.apache.spark.sql.Row.fromSeq), parts),
      org.apache.spark.sql.types.StructType((0 until d).map(i =>
        org.apache.spark.sql.types.StructField(s"v$i",
          org.apache.spark.sql.types.LongType))))
    val got = Skyline.paretoFrontKD(df, (0 until d).map(i => col(s"v$i")))
      .collect()
      .map(r => ((0 until d).map(r.getLong): Seq[Long], r.getLong(d)))
      .toSet
    graft.Storage.releaseAll(spark)
    got
  }

  test("paretoFrontKD matches brute force at d = 3 and d = 4 across partitionings") {
    val rnd = new Random(41)
    val rows3 = Seq.fill(600)(Seq.fill(3)(rnd.nextInt(12).toLong - 6L))
    for (parts <- Seq(1, 4, 13))
      assert(runKD(rows3, 3, parts) == bruteKD(rows3), s"d=3 parts=$parts")
    val rows4 = Seq.fill(400)(Seq.fill(4)(rnd.nextInt(8).toLong))
    assert(runKD(rows4, 4) == bruteKD(rows4), "d=4")
  }

  test("paretoFrontKD at d = 2 agrees with the 2-D sort + running-max path") {
    val rnd = new Random(53)
    val rows = Seq.fill(300)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val kd = runKD(rows.map(p => Seq(p._1, p._2)), 2)
      .map { case (c, n) => (c(0), c(1), n) }
    assert(kd == run(rows))
  }

  test("paretoFrontKD: chains, duplicates, and a dominance-heavy hand case") {
    // front: (5,1,1), (1,5,1), (3,3,3); (3,3,2) dominated by (3,3,3);
    // (2,2,2) dominated; duplicate front point counts rows
    val rows = Seq(
      Seq(5L, 1L, 1L), Seq(5L, 1L, 1L), Seq(1L, 5L, 1L), Seq(3L, 3L, 3L),
      Seq(3L, 3L, 2L), Seq(2L, 2L, 2L))
    assert(runKD(rows, 3) == Set(
      (Seq(5L, 1L, 1L), 2L), (Seq(1L, 5L, 1L), 1L), (Seq(3L, 3L, 3L), 1L)))
    // a totally-ordered chain leaves one survivor
    val chain = (1L to 15L).map(i => Seq(i, i, i))
    assert(runKD(chain, 3) == Set((Seq(15L, 15L, 15L), 1L)))
  }

  // ---- onion layers ----

  private def bruteOnion(rows: Seq[Seq[Long]], layers: Int): Set[(Long, Seq[Long], Long)] = {
    var rem = rows
    (1 to layers).flatMap { l =>
      val front = bruteKD(rem)
      val fpts = front.map(_._1)
      rem = rem.filterNot(fpts.contains)
      front.map { case (p, n) => (l.toLong, p, n) }
    }.toSet
  }

  private def runOnion(rows: Seq[Seq[Long]], d: Int, layers: Int,
                       parts: Int = 4): Set[(Long, Seq[Long], Long)] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(org.apache.spark.sql.Row.fromSeq), parts),
      org.apache.spark.sql.types.StructType((0 until d).map(i =>
        org.apache.spark.sql.types.StructField(s"v$i",
          org.apache.spark.sql.types.LongType))))
    val got = Skyline.onionLayersKD(df, (0 until d).map(i => col(s"v$i")), layers)
      .collect()
      .map(r => (r.getLong(0),
        (1 to d).map(r.getLong): Seq[Long], r.getLong(d + 1)))
      .toSet
    graft.Storage.releaseAll(spark)
    got
  }

  test("onionLayersKD peels fronts: brute parity across partitionings; layer 1 is the front") {
    val rnd = new Random(67)
    val rows = Seq.fill(500)(Seq.fill(3)(rnd.nextInt(10).toLong))
    for (parts <- Seq(1, 4, 13))
      assert(runOnion(rows, 3, 3, parts) == bruteOnion(rows, 3), s"parts=$parts")
    val l1 = runOnion(rows, 3, 1).map { case (_, p, n) => (p, n) }
    assert(l1 == runKD(rows, 3))
    // a totally-ordered chain peels one point per layer, top down
    val chain = (1L to 10L).map(i => Seq(i, i, i))
    assert(runOnion(chain, 3, 3) == Set(
      (1L, Seq(10L, 10L, 10L), 1L), (2L, Seq(9L, 9L, 9L), 1L),
      (3L, Seq(8L, 8L, 8L), 1L)))
  }

  // ---- per-group skyline ----

  private def bruteByGroup(rows: Seq[(String, Seq[Long])]): Set[(String, Seq[Long], Long)] =
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      bruteKD(rs.map(_._2)).map { case (p, n) => (g, p, n) }
    }.toSet

  private def runByGroup(rows: Seq[(String, Seq[Long])], d: Int,
                         parts: Int = 4): Set[(String, Seq[Long], Long)] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (g, cs) =>
          org.apache.spark.sql.Row.fromSeq(g +: cs) }, parts),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType) +:
        (0 until d).map(i => org.apache.spark.sql.types.StructField(s"v$i",
          org.apache.spark.sql.types.LongType))))
    val got = Skyline.paretoFrontKDByGroup(df, col("g"),
        (0 until d).map(i => col(s"v$i")))
      .collect()
      .map(r => (r.getString(0),
        (1 to d).map(r.getLong): Seq[Long], r.getLong(d + 1)))
      .toSet
    graft.Storage.releaseAll(spark)
    got
  }

  test("paretoFrontKDByGroup matches per-group brute force across partitionings") {
    val rnd = new Random(59)
    val rows = Seq.fill(600)((s"g${rnd.nextInt(5)}",
      Seq.fill(3)(rnd.nextInt(10).toLong - 5L)))
    for (parts <- Seq(1, 4, 13))
      assert(runByGroup(rows, 3, parts) == bruteByGroup(rows), s"parts=$parts")
  }

  test("paretoFrontKDByGroup keeps the group column's input type (long keys)") {
    val df = Seq((7L, 3L, 1L), (7L, 1L, 3L), (7L, 1L, 1L), (9L, 5L, 5L))
      .toDF("g", "a", "b")
    val got = Skyline.paretoFrontKDByGroup(df, col("g"), Seq(col("a"), col("b")))
    assert(got.schema("grp").dataType ==
      org.apache.spark.sql.types.LongType)
    val rows = got.as[(Long, Long, Long, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    assert(rows == Set((7L, 3L, 1L, 1L), (7L, 1L, 3L, 1L), (9L, 5L, 5L, 1L)))
  }

  test("paretoFrontKDByGroup: dominance never leaks across groups") {
    // (1,1,1) in group b is dominated by a's (9,9,9) globally but is b's
    // entire front; identical coordinates count rows within their group
    val rows = Seq(
      ("a", Seq(9L, 9L, 9L)), ("a", Seq(1L, 1L, 1L)),
      ("b", Seq(1L, 1L, 1L)), ("b", Seq(1L, 1L, 1L)))
    assert(runByGroup(rows, 3) == Set(
      ("a", Seq(9L, 9L, 9L), 1L), ("b", Seq(1L, 1L, 1L), 2L)))
    // and each group's front equals paretoFrontKD run on that group alone
    val rnd = new Random(61)
    val mixed = Seq.fill(300)((s"g${rnd.nextInt(3)}",
      Seq.fill(3)(rnd.nextInt(8).toLong)))
    val whole = runByGroup(mixed, 3)
    for (g <- Seq("g0", "g1", "g2")) {
      val alone = runKD(mixed.filter(_._1 == g).map(_._2), 3)
        .map { case (p, n) => (g, p, n) }
      assert(whole.filter(_._1 == g) == alone, g)
    }
  }
}
