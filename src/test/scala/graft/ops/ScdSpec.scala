package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (key, t, tie, value) — key 1 changes A→A→B→B→A; key 2 is constant;
  // key 3 opens with a NULL version then changes to a value.
  private val log = Seq(
    (1L, 10L, 101L, Some("A")), (1L, 20L, 102L, Some("A")),
    (1L, 30L, 103L, Some("B")), (1L, 40L, 104L, Some("B")),
    (1L, 50L, 105L, Some("A")),
    (2L, 10L, 201L, Some("X")), (2L, 90L, 202L, Some("X")),
    (3L, 10L, 301L, None), (3L, 20L, 302L, Some("C")),
  ).toDF("k", "t", "tie", "v")

  private def versions =
    Scd.fromChangeLog(log, Seq("k"), col("t"), col("tie"), Seq("v"))
      .select(col("k"), col("v"), col("valid_from"), col("valid_to"))
      .as[(Long, Option[String], Long, Option[Long])].collect().toSet

  test("intervals open on change only, duplicates collapse, current version is open") {
    assert(versions == Set(
      (1L, Some("A"), 10L, Some(30L)),
      (1L, Some("B"), 30L, Some(50L)),
      (1L, Some("A"), 50L, None),
      (2L, Some("X"), 10L, None),
      (3L, None, 10L, Some(20L)),      // a NULL version is a real version
      (3L, Some("C"), 20L, None)))
  }

  test("each key's intervals tile the timeline without gaps") {
    val byKey = versions.groupBy(_._1)
    byKey.values.foreach { vs =>
      val sorted = vs.toSeq.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3), s"gap after $a")
        case _ => ()
      }
      assert(sorted.last._4.isEmpty, "last version must be open")
    }
  }

  test("both windows share one planned sort: a single Exchange") {
    val plan = Scd.fromChangeLog(log, Seq("k"), col("t"), col("tie"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
