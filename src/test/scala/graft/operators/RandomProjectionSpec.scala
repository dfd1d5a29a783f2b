package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RandomProjectionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString.take(15), 16)

  private def refProject(vec: Seq[Float], k: Int): Seq[Long] = {
    val xs = vec.map(x => math.floor(x.toDouble * 1000000.0).toLong)
    (0 until k).map { j =>
      xs.zipWithIndex.map { case (x, i) =>
        if (hash60(s"rp:$i:$j") % 2 == 0) x else -x
      }.sum
    }
  }

  test("projection matches the driver replay at several partitionings") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.25f, 3.0f, 0.0f)),
      (2L, Seq(-0.001f, 2.5f, -2.5f, 1.0f)),
      (3L, Seq(1.0f, 0.0f, 0.0f, -7.5f)))
    for (np <- Seq(1, 3)) {
      val got = RandomProjection.projectSigned(
        vecs.toDF("vec_id", "embedding").repartition(np),
        "vec_id", "embedding", k = 5)
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      for ((id, v) <- vecs)
        assert(got(id) == refProject(v, 5), s"vec $id np=$np")
    }
  }

  test("the precomputed sign matrix uses the portable hash (parity pin)") {
    // the driver-side md5-60 must equal the Spark column function the
    // oracle mirrors — one divergent byte and every sign flips
    val viaSpark = Seq(Tuple1("rp:3:1")).toDF("s")
      .select(graft.functions.PortableHash.hash60(col("s"))).as[Long].head()
    assert(viaSpark == hash60("rp:3:1"))
  }

  test("mixed vector dimensions are rejected loudly") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      RandomProjection.projectSigned(df, "vec_id", "embedding", k = 2)
    }
  }

  test("empty and null vectors are excluded; the plan never shuffles") {
    val df = Seq((1L, Some(Seq(1.0f))), (2L, Some(Seq.empty[Float])),
      (3L, None: Option[Seq[Float]])).toDF("vec_id", "embedding")
    val out = RandomProjection.projectSigned(df, "vec_id", "embedding", k = 2)
    assert(out.select("vec_id").distinct().as[Long].collect().toSeq == Seq(1L))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("linearity: projecting 2x the vector doubles every component (exact longs)") {
    val v = Seq(0.5f, -1.5f, 2.0f)
    val df = Seq((1L, v), (2L, v.map(_ * 2))).toDF("vec_id", "embedding")
    val got = RandomProjection.projectSigned(df, "vec_id", "embedding", k = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got(2L) == got(1L).map(_ * 2))
  }
}
