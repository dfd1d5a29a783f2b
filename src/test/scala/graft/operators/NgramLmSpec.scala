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

  test("interpolated trigram score matches a driver-side replay; backoff on unseen orders") {
    val scale2 = 1000000L; val (w3, w2, w1) = (6L, 3L, 1L); val d = 10L
    def replay(scoring: Seq[(Long, Seq[String])],
               model: Seq[(Long, Seq[String])]): Map[Long, (Long, Long)] = {
      val tg = model.flatMap(_._2.sliding(3).filter(_.size == 3).map(x => (x(0), x(1), x(2))))
      val bgr = model.flatMap(_._2.sliding(2).filter(_.size == 2).map(x => (x(0), x(1))))
      val c3 = tg.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val x3 = tg.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toLong).toMap
      val c2 = bgr.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val x2 = bgr.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val c1 = model.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = model.map(_._2.size.toLong).sum
      def term(w: Long, num: Long, den: Long): Long =
        if (den > 0) w * scale2 * num / (d * den) else 0L
      scoring.flatMap { case (id, ws) =>
        val qs = ws.sliding(3).filter(_.size == 3).toSeq.map { case Seq(a, b, c) =>
          term(w3, c3.getOrElse((a, b, c), 0L), x3.getOrElse((a, b), 0L)) +
          term(w2, c2.getOrElse((b, c), 0L), x2.getOrElse(b, 0L)) +
          term(w1, c1.getOrElse(c, 0L), n)
        }
        if (qs.isEmpty) None else Some(id -> (qs.size.toLong, qs.sum))
      }.toMap
    }
    // self-scoring parity at several partitionings
    for (np <- Seq(1, 5)) {
      val df = corpus.toDF("doc_id", "toks").repartition(np)
      val got = NgramLm.trigramScoreQuantized(df, df, "doc_id", "toks")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == replay(corpus, corpus), s"np=$np")
    }
    // fresh text: unseen trigram backs off to bigram+unigram; unseen
    // context contributes zero instead of dividing by zero
    val fresh = Seq((8L, Seq("the", "cat", "mat", "zz")))
    val got = NgramLm.trigramScoreQuantized(fresh.toDF("doc_id", "toks"),
        corpus.toDF("doc_id", "toks"), "doc_id", "toks")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == replay(fresh, corpus))
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

  test("saved trigram model scores bit-identically to the fitted path") {
    val t = "graft_trigram_spec"
    dropTable(t)
    val model = corpus.toDF("doc_id", "toks")
    NgramLm.saveTrigramModel(model, "doc_id", "toks", t)
    // fresh docs exercise every backoff branch (unseen trigram/bigram/
    // unigram, unseen contexts) through the LOADED counts
    val docs = (corpus ++ Seq((8L, Seq("the", "cat", "mat", "zz"))))
      .toDF("doc_id", "toks")
    val fitted = NgramLm.trigramScoreQuantized(docs, model, "doc_id", "toks")
      .as[(Long, Long, Long)].collect().toSet
    for (np <- Seq(1, 3)) {
      val served = NgramLm.trigramScoreFromStore(spark, t,
          docs.repartition(np), "doc_id", "toks")
        .as[(Long, Long, Long)].collect().toSet
      assert(served == fitted, s"np=$np")
    }
    dropTable(t)
  }
}
