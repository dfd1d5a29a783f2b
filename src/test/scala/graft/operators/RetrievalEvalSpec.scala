package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalEvalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(ranked: Seq[(Long, Long, Long)],
                  rel: Seq[(Long, Long)], k: Int): Map[Long, Row] =
    RetrievalEval.metrics(ranked.toDF("q", "d", "r"), "q", "d", "r",
        rel.toDF("rq", "rd"), "rq", "rd", k)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("hand-checked metrics: rank-1 hit, rank-3 first hit, no hit, empty judgments") {
    // q1: hits at ranks 1 and 3 of 5 relevant; q2: first hit rank 3 of 1;
    // q3: no hits, 2 relevant; q4: empty judgment set.
    val ranked = (1L to 4L).flatMap(q => (1L to 5L).map(r => (q, q * 100 + r, r)))
    val rel = Seq((1L, 101L), (1L, 103L), (1L, 999L), (1L, 998L), (1L, 997L),
      (2L, 203L), (3L, 777L), (3L, 778L))
    val m = run(ranked, rel, k = 5)
    val r1 = m(1L)
    assert(r1.getAs[Long]("n_rel") == 5L && r1.getAs[Long]("n_rel_at_k") == 2L)
    assert(r1.getAs[Long]("first_rel_rank") == 1L && r1.getAs[Long]("rr_ppm") == 1000000L)
    assert(r1.getAs[Long]("p_at_k_ppm") == 400000L)
    assert(r1.getAs[Long]("r_at_k_ppm") == 400000L)
    val r2 = m(2L)
    assert(r2.getAs[Long]("rr_ppm") == 1000000L / 3L)
    assert(r2.getAs[Long]("r_at_k_ppm") == 1000000L)
    val r3 = m(3L)
    assert(r3.getAs[Long]("n_rel_at_k") == 0L && r3.getAs[Long]("rr_ppm") == 0L)
    assert(r3.isNullAt(r3.fieldIndex("first_rel_rank")))
    assert(r3.getAs[Long]("p_at_k_ppm") == 0L && r3.getAs[Long]("r_at_k_ppm") == 0L)
    val r4 = m(4L)
    assert(r4.getAs[Long]("n_rel") == 0L)
    assert(r4.isNullAt(r4.fieldIndex("r_at_k_ppm")), "empty judgments: recall undefined, not 0")
    assert(r4.getAs[Long]("rr_ppm") == 0L)
  }

  test("duplicate judgment pairs collapse; ranks beyond k are ignored") {
    val ranked = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val rel = Seq((1L, 11L), (1L, 11L), (1L, 12L))
    val m = run(ranked, rel, k = 2)
    val r = m(1L)
    assert(r.getAs[Long]("n_rel") == 2L, "duplicate pairs must count once")
    assert(r.getAs[Long]("n_rel_at_k") == 1L, "the rank-3 hit is outside k=2")
    assert(r.getAs[Long]("first_rel_rank") == 2L && r.getAs[Long]("rr_ppm") == 500000L)
  }
}
