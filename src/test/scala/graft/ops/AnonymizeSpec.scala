package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnonymizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "A", 10.0), (2L, "A", 10.4), (3L, "A", 10.9),  // band 10 × A: 3 rows
    (4L, "A", 11.0),                                     // band 11 × A: 1 row
    (5L, "B", 10.0), (6L, "B", 10.5),                    // band 10 × B: 2 rows
    (7L, "B", -0.5),                                     // band -1 × B: 1 row
  ).toDF("id", "seg", "bal")

  private def anonymized(k: Long) =
    Anonymize.kAnonymize(
      rows.select(col("id"), col("seg"),
        Anonymize.bandNumeric(col("bal"), 1.0).as("band")),
      Seq(col("seg"), col("band")), k)

  test("groups below k are suppressed; survivors carry their group size") {
    val got = anonymized(2)
      .select(col("id"), col("group_size")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 5L -> 2L, 6L -> 2L))
  }

  test("k=1 keeps everything, an unreachable k keeps nothing") {
    assert(anonymized(1).count() == 7)
    assert(anonymized(100).count() == 0)
  }

  test("bandNumeric uses floor semantics for negative values") {
    val bands = rows.select(col("id"),
        Anonymize.bandNumeric(col("bal"), 1.0).as("band"))
      .as[(Long, Long)].collect().toMap
    assert(bands(7L) == -1L) // truncation would give 0 and merge it into band 0
    assert(bands(1L) == 10L && bands(4L) == 11L)
  }

  test("the group count attaches without a second shuffle: one Exchange only") {
    val plan = anonymized(2).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, plan)
  }

  // ---- l-diversity ----

  private val sens = Seq(
    // group (A, 0): 3 rows, sensitive {x, y, z} — diverse
    (1L, "A", 0L, Some("x")), (2L, "A", 0L, Some("y")), (3L, "A", 0L, Some("z")),
    // group (A, 1): 3 rows, all sensitive "x" — k-anonymous but HOMOGENEOUS
    (4L, "A", 1L, Some("x")), (5L, "A", 1L, Some("x")), (6L, "A", 1L, Some("x")),
    // group (B, 0): sensitive {x, null} — null is a real value, diverse at l=2
    (7L, "B", 0L, Some("x")), (8L, "B", 0L, None),
  ).toDF("id", "seg", "band", "nat")

  test("lDiversify suppresses homogeneous groups k-anonymity keeps; null sensitive is a real value") {
    val l3 = Anonymize.lDiversify(sens, Seq(col("seg"), col("band")),
        col("nat"), l = 3)
      .select(col("id"), col("distinct_sensitive")).as[(Long, Long)]
      .collect().toMap
    assert(l3.keySet == Set(1L, 2L, 3L), s"got $l3")
    // the homogeneous (A,1) group passes k=3 anonymity but fails l=2
    val k3ids = Anonymize.kAnonymize(sens, Seq(col("seg"), col("band")), k = 3)
      .select(col("id")).as[Long].collect().toSet
    assert(k3ids.contains(4L))
    val l2 = Anonymize.lDiversify(sens, Seq(col("seg"), col("band")),
        col("nat"), l = 2)
      .select(col("id"), col("distinct_sensitive")).as[(Long, Long)]
      .collect().toMap
    assert(!l2.contains(4L), "homogeneous group must be suppressed at l=2")
    assert(l2(7L) == 2L && l2(8L) == 2L, "null must count as a distinct sensitive value")
  }

  test("lDiversify is one Exchange too") {
    val plan = Anonymize.lDiversify(sens, Seq(col("seg"), col("band")),
      col("nat"), l = 2).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
