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
}
