package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram LM invariants: the model and score match a driver-side integer
  * replay, are invariant to input partitioning, score unseen contexts at
  * the smoothing floor, and documents under two tokens never appear. The
  * independent end-to-end checks are the q165/q166 oracles.
  */
class NgramLmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Seq("the", "cat", "sat", "on", "the", "mat")),
    (2L, Seq("the", "cat", "ran")),
    (3L, Seq("solo")),          // 1 token: no bigrams
    (4L, Seq[String]()),        // empty: no bigrams, no vocab rows
    (5L, Seq("on", "the", "cat")))

  private val scale = 1000000L

  private def refModel: Map[(String, String), (Long, Long, Long)] = {
    val bgs = corpus.flatMap { case (_, ws) => ws.sliding(2).filter(_.size == 2) }
      .map { case Seq(a, b) => (a, b) }
    val cg = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cc = bgs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = corpus.flatMap(_._2).distinct.size.toLong
    cg.map { case ((a, b), c) =>
      (a, b) -> (c, cc(a), scale * (c + 1) / (cc(a) + v)) }
  }

  private def refScores: Map[Long, (Long, Long)] = {
    val m = refModel
    val v = corpus.flatMap(_._2).distinct.size.toLong
    val cc = m.map { case ((a, _), (_, ca, _)) => a -> ca }
    corpus.flatMap { case (id, ws) =>
      val qs = ws.sliding(2).filter(_.size == 2).toSeq.map { case Seq(a, b) =>
        scale * (m.get((a, b)).map(_._1).getOrElse(0L) + 1) /
          (cc.getOrElse(a, 0L) + v)
      }
      if (qs.isEmpty) None else Some(id -> (qs.size.toLong, qs.sum))
    }.toMap
  }

  test("bigramModel matches the driver-side replay at several partitionings") {
    for (np <- Seq(1, 3, 7)) {
      val got = NgramLm.bigramModel(
        corpus.toDF("doc_id", "toks").repartition(np), "doc_id", "toks")
        .as[(String, String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
      assert(got == refModel, s"np=$np")
    }
  }

  test("self-score matches the replay; short documents never appear") {
    val df = corpus.toDF("doc_id", "toks")
    val got = NgramLm.scoreQuantized(df, df, "doc_id", "toks")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == refScores)
    assert(!got.contains(3L) && !got.contains(4L))
  }

  test("unseen bigrams and contexts score at the smoothing floor, never null") {
    val model = corpus.toDF("doc_id", "toks")
    val fresh = Seq((9L, Seq("zz", "qq", "the"))).toDF("doc_id", "toks")
    val v = corpus.flatMap(_._2).distinct.size.toLong
    val got = NgramLm.scoreQuantized(fresh, model, "doc_id", "toks")
      .as[(Long, Long, Long)].collect().head
    // zz->qq and qq->the: both contexts unseen → floor(scale/V) each
    assert(got == ((9L, 2L, 2 * (scale / v))))
  }
}
