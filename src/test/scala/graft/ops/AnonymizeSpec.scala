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
}
