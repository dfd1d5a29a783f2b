package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class MmrSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Reference greedy MMR, one query. */
  private def bruteOne(qv: Seq[Float], qid: Long,
                       corpus: Seq[(Long, Seq[Float])],
                       nCand: Int, nSel: Int,
                       lambda: Double): Seq[(Long, Long, Double, Double)] = {
    val cand = corpus.filter(_._1 != qid)
      .map { case (id, v) => (id, v, round6(cos(qv, v))) }
      .sortBy { case (id, _, r) => (-r, id) }
      .take(nCand)
    val sim = (for {
      a <- cand; b <- cand if a._1 != b._1
    } yield (a._1, b._1) -> round6(cos(a._2, b._2))).toMap
    var selected = Vector.empty[(Long, Long, Double, Double)] // (rank,id,rel,score)
    for (r <- 1 to nSel) {
      val picks = cand.filter(c => !selected.exists(_._2 == c._1)).map {
        case (id, _, rel) =>
          val score =
            if (selected.isEmpty) lambda * rel
            else lambda * rel - (1.0 - lambda) *
              selected.map(s => sim((id, s._2))).max
          (id, rel, score)
      }
      val (id, rel, score) = picks.sortBy { case (i, _, s) => (-s, i) }.head
      selected :+= ((r.toLong, id, rel, score))
    }
    selected
  }

  private def run(queries: Seq[(Long, Seq[Float])],
                  corpus: Seq[(Long, Seq[Float])],
                  nCand: Int, nSel: Int, lambda: Double)
      : Map[Long, Seq[(Long, Long, Double, Double)]] =
    Mmr.rerank(corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
        queries.toDF("query_id", "qv"), "query_id", "qv",
        nCand, nSel, lambda)
      .as[(Long, Long, Long, Double, Double)].collect()
      .groupBy(_._1)
      .map { case (q, rows) =>
        q -> rows.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5)).toSeq
      }

  test("a clone of the first pick is pushed below a diverse candidate") {
    val qv = Seq(1f, 0f, 0f)
    val corpus = Seq(
      (10L, Seq(0.99f, 0.10f, 0f)),  // best rel
      (11L, Seq(0.99f, 0.11f, 0f)),  // near-clone of 10, rel rank 2
      (12L, Seq(0.70f, 0f, 0.70f)))  // diverse, rel rank 3
    val got = run(Seq((1L, qv)), corpus, nCand = 3, nSel = 3, lambda = 0.5)(1L)
    // Pure relevance would order 10, 11, 12; MMR demotes the clone.
    assert(got.map(_._2) == Seq(10L, 12L, 11L))
  }

  test("lambda = 1 reduces to the relevance ranking") {
    val qv = Seq(1f, 0f)
    val corpus = (1L to 8L).map(i => (i, Seq(1f, i.toFloat / 10f)))
    val got = run(Seq((99L, qv)), corpus, nCand = 5, nSel = 5, lambda = 1.0)(99L)
    assert(got.map(_._2) == (1L to 5L))
  }

  test("self-match is excluded when the query id is in the corpus") {
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)))
    val got = run(Seq((1L, Seq(1f, 0f))), corpus,
      nCand = 2, nSel = 1, lambda = 0.7)(1L)
    assert(got.map(_._2) == Seq(2L))
  }

  test("matches brute force per query on random data") {
    val rnd = new Random(23)
    val corpus = (0L until 60L).map(i =>
      (i, Seq.fill(5)(rnd.nextFloat() - 0.5f)))
    val queries = Seq((0L, corpus(0)._2), (1L, corpus(1)._2))
    val got = run(queries, corpus, nCand = 12, nSel = 6, lambda = 0.7)
    for ((qid, qv) <- queries) {
      val exp = bruteOne(qv, qid, corpus, 12, 6, 0.7)
      assert(got(qid) == exp, s"query $qid")
    }
  }
}
