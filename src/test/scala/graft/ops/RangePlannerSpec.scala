package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangePlannerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("uniform values split into near-equal buckets; counts conserve rows") {
    val df = (1 to 800).map(_.toLong).toDF("v")
    for (np <- Seq(1, 7)) {
      val out = RangePlanner.equiDepth(df.repartition(np), col("v"), 8)
        .as[(Long, Option[Double], Option[Double], Long)].collect().sortBy(_._1)
      assert(out.map(_._4).sum == 800L)
      assert(out.length == 8)
      assert(out.forall(b => b._4 >= 90 && b._4 <= 110), out.toSeq)
      // ends unbounded; interior boundaries chain: hi(j) == lo(j+1)
      assert(out.head._2.isEmpty && out.last._3.isEmpty)
      out.sliding(2).foreach { case Array(a, b) => assert(a._3 == b._2) case _ => () }
    }
    graft.Storage.releaseAll(spark)
  }

  test("boundary values go LEFT; nulls and skew are surfaced, not hidden") {
    // 10 copies of 1..4: quartile cuts land ON values; v == boundary → left
    val df = ((1 to 4).flatMap(v => Seq.fill(10)(v.toLong)).map(Option(_))
      ++ Seq(None, None)).toDF("v")
    val out = RangePlanner.equiDepth(df, col("v"), 4)
      .as[(Long, Option[Double], Option[Double], Long)].collect().sortBy(_._1)
    assert(out.map(_._4).sum == 40L, "nulls excluded")
    // a value with frequency n/B sits entirely in one bucket
    assert(out.forall(_._4 == 10L), out.toSeq)
    graft.Storage.releaseAll(spark)
  }
}
