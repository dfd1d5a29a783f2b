package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class LabelAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("majority vote, smallest-label tiebreak, no-neighbor null, suspect flag") {
    // graph: 1 → {2,3,4}; 2 → {3,4}; 5 → (nothing); 6 → {2,3}
    val graph = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L),
      (6L, 2L), (6L, 3L)).toDF("vec_id", "neighbor_id")
    val labels = Seq((1L, 0), (2L, 1), (3L, 1), (4L, 2), (5L, 0), (6L, 1))
      .toDF("vec_id", "label")
    val got = LabelAudit.neighborVote(graph, labels, "vec_id", "label")
      .as[(Long, Int, Option[Int], Option[Long], Option[Boolean])]
      .collect().toSet
    assert(got == Set(
      // 1's neighbors vote {1,1,2} → majority 1 (2 votes) ≠ own 0 → suspect
      (1L, 0, Some(1), Some(2L), Some(true)),
      // 2's neighbors vote {1,2} → TIE at 1 vote each → smallest label 1
      // = own → not suspect
      (2L, 1, Some(1), Some(1L), Some(false)),
      (3L, 1, None, None, None), // no outgoing neighbors → no vote
      (4L, 2, None, None, None),
      (5L, 0, None, None, None),
      // 6's neighbors both labeled 1 = own → clean agreement
      (6L, 1, Some(1), Some(2L), Some(false))))
  }

  test("unlabeled neighbors simply don't vote") {
    val graph = Seq((1L, 2L), (1L, 3L)).toDF("vec_id", "neighbor_id")
    val labels = Seq((1L, 0), (2L, 5)).toDF("vec_id", "label") // 3 unlabeled
    val got = LabelAudit.neighborVote(graph, labels, "vec_id", "label")
      .as[(Long, Int, Option[Int], Option[Long], Option[Boolean])]
      .collect().toSet
    assert(got.contains((1L, 0, Some(5), Some(1L), Some(true))))
  }
}
