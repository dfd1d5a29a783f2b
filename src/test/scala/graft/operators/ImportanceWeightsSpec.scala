package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance invariants: matches a driver-side integer replay
  * (features hashed with the SAME portable hash), is invariant to input
  * partitioning, weights target-like documents above target-unlike ones,
  * and smooths unseen-in-target features to the floor instead of
  * dropping them. The independent end-to-end check is the q182 oracle.
  */
class ImportanceWeightsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (100L, Seq("the", "quick", "brown", "fox", "jumps")),
    (101L, Seq("the", "quick", "red", "fox", "runs")),
    (102L, Seq("a", "quick", "brown", "dog", "jumps")))
  // raw: doc 1 shares target bigrams, doc 2 shares none, doc 3 too short
  private val raw = Seq(
    (1L, Seq("the", "quick", "brown", "fox")),
    (2L, Seq("voiture", "rouge", "dans", "rue")),
    (3L, Seq("solo")))

  private val buckets = 4096
  private val scale = 1000000L

  // the same md5-60 the engine uses, via the engine itself (one tiny frame)
  private lazy val h: Map[String, Long] = {
    val grams = (target ++ raw).flatMap(_._2.sliding(2).filter(_.size == 2)
      .map(_.mkString(" "))).distinct
    grams.toDF("g")
      .select(col("g"), pmod(PortableHash.hash60(col("g")), lit(buckets.toLong)))
      .as[(String, Long)].collect().toMap
  }

  private def feats(docs: Seq[(Long, Seq[String])]): Seq[(Long, Long)] =
    docs.flatMap { case (id, ws) =>
      ws.sliding(2).filter(_.size == 2).map(g => id -> h(g.mkString(" "))) }

  private def replay: Map[Long, (Long, Long)] = {
    val tf = feats(target).map(_._2)
    val rf = feats(raw)
    val ct = tf.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = rf.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (tf.size.toLong, rf.size.toLong)
    def w(f: Long): Long =
      scale * (ct.getOrElse(f, 0L) + 1) * (nr + buckets) /
        ((cr(f) + 1) * (nt + buckets))
    rf.groupBy(_._1).map { case (id, fs) =>
      id -> (fs.size.toLong, fs.map(p => w(p._2)).sum) }
  }

  private def run(np: Int): Map[Long, (Long, Long)] =
    ImportanceWeights.dsirScoreQuantized(
      raw.toDF("doc_id", "toks").repartition(np),
      target.toDF("doc_id", "toks").repartition(np),
      "doc_id", "toks", buckets, scale)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("dsirScoreQuantized matches the driver replay at several partitionings") {
    for (np <- Seq(1, 3)) assert(run(np) == replay, s"np=$np")
  }

  test("target-like raw docs outscore target-unlike; short docs never appear") {
    val got = run(1)
    assert(!got.contains(3L)) // no bigrams → no features → absent
    // per-feature mean: doc 1's bigrams all occur in target, doc 2's never
    val m1 = got(1L)._2 / got(1L)._1
    val m2 = got(2L)._2 / got(2L)._1
    assert(m1 > m2, s"target-like mean $m1 must exceed unlike mean $m2")
    // the unlike doc still scores (smoothing floor), never drops
    assert(got(2L)._2 > 0)
  }
}
