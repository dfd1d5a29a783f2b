package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HyperLogLogSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- plain-Scala replica (same md5-based 60-bit family) ----
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
  private def naiveRegisters(vals: Seq[String], p: Int): Map[Long, Long] = {
    val m = 1L << p
    vals.foldLeft(Map.empty[Long, Long]) { (acc, v) =>
      val h = hash60(v)
      val (reg, s) = (h % m, h / m)
      val rank: Long = if (s == 0) 61L - p
                       else (60L - p) - (64 - java.lang.Long.numberOfLeadingZeros(s)) + 1
      acc.updated(reg, math.max(acc.getOrElse(reg, 0L), rank))
    }
  }

  private val values: Seq[String] = (1 to 800).map(i => s"v$i") ++ (1 to 400).map(i => s"v$i")

  test("register table equals the plain-Scala HLL (dups change nothing)") {
    for (p <- Seq(4, 6, 8)) {
      val got = HyperLogLog.registers(values.map(Tuple1(_)).toDF("t"), "t", p)
        .as[(Long, Long)].collect().toMap
      assert(got == naiveRegisters(values, p), s"p=$p")
      assert(got.size <= (1 << p))
    }
  }

  test("merge equals the sketch of the union (per-register max)") {
    val (a, b) = values.splitAt(500)
    val merged = HyperLogLog.merge(
        HyperLogLog.registers(a.map(Tuple1(_)).toDF("t"), "t", 6),
        HyperLogLog.registers(b.map(Tuple1(_)).toDF("t"), "t", 6))
      .as[(Long, Long)].collect().toMap
    val whole = HyperLogLog.registers(values.map(Tuple1(_)).toDF("t"), "t", 6)
      .as[(Long, Long)].collect().toMap
    assert(merged == whole)
  }

  test("the estimate lands near the true distinct count") {
    val regs = HyperLogLog.registers(values.map(Tuple1(_)).toDF("t"), "t", 8)
      .as[(Long, Long)].collect().toSeq
    val est = HyperLogLog.estimateFromRegisters(regs, 8)
    val err = math.abs(est - 800.0) / 800.0
    assert(err < 0.25, s"estimate $est for 800 distinct (err $err)")
  }

  test("small cardinalities hit the linear-counting correction exactly") {
    val regs = HyperLogLog.registers(Seq("a", "b", "c").map(Tuple1(_)).toDF("t"), "t", 6)
      .as[(Long, Long)].collect().toSeq
    assert(math.round(HyperLogLog.estimateFromRegisters(regs, 6)) == 3L)
  }

  test("grouped registers equal each group's independent sketch; estimates track sizes") {
    // three groups with distinct counts 400 / 50 / 3 (plus duplicates)
    val rows = (0 until 400).map(i => ("big", s"b$i")) ++
      (0 until 50).flatMap(i => Seq(("mid", s"m$i"), ("mid", s"m$i"))) ++
      Seq(("tiny", "x"), ("tiny", "y"), ("tiny", "z"))
    val df = rows.toDF("g", "k")
    val grouped = HyperLogLog.registersByGroup(df, "g", "k", p = 6)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    for (g <- Seq("big", "mid", "tiny")) {
      val solo = HyperLogLog.registers(
          rows.filter(_._1 == g).map(r => Tuple1(r._2)).toDF("k"), "k", 6)
        .as[(Long, Long)].collect().toSeq
      assert(grouped(g).sortBy(_._1) == solo.sortBy(_._1), g)
    }
    val est = grouped.view.mapValues(r =>
      HyperLogLog.estimateFromRegisters(r, 6)).toMap
    assert(math.round(est("tiny")) == 3L, "linear counting per group")
    assert(math.abs(est("mid") - 50) / 50.0 < 0.3, s"mid ${est("mid")}")
    assert(math.abs(est("big") - 400) / 400.0 < 0.3, s"big ${est("big")}")
    assert(est("big") > est("mid") && est("mid") > est("tiny"))
  }
}
