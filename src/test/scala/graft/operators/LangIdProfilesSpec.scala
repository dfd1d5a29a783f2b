package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cavnar–Trenkle invariants: a document made of one language's training
  * text classifies to it, the distance matches a driver-side replay, and
  * results are partitioning-invariant. The independent end-to-end check
  * is the q174 oracle.
  */
class LangIdProfilesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "aa", "the cat sat on the mat and the dog ran off then the cat came back"),
    (2L, "aa", "the dog and the cat sat near the mat while the cat ran"),
    (3L, "bb", "zug zug grok zug blarg grok zug nix blarg zug grok nix nix"),
    (4L, "bb", "grok blarg zug nix grok zug blarg nix zug grok"))

  private def refClassify(text: String, topK: Int, topM: Int,
                          penalty: Long): (String, Long) = {
    def gramsOf(s: String) = (0 to s.length - 3).map(i => s.substring(i, i + 3))
    val profiles = train.groupBy(_._2).map { case (lang, docs) =>
      val c = docs.flatMap(d => gramsOf(d._3)).groupBy(identity)
        .view.mapValues(_.size).toSeq
      lang -> c.sortBy { case (g, n) => (-n, g) }.take(topK)
        .zipWithIndex.map { case ((g, _), i) => g -> (i + 1).toLong }.toMap
    }
    val dc = gramsOf(text).groupBy(identity).view.mapValues(_.size).toSeq
    val dp = dc.sortBy { case (g, n) => (-n, g) }.take(topM)
      .zipWithIndex.map { case ((g, _), i) => g -> (i + 1).toLong }
    profiles.map { case (lang, prof) =>
      lang -> dp.map { case (g, dr) =>
        prof.get(g).map(r => math.abs(dr - r)).getOrElse(penalty) }.sum
    }.toSeq.minBy { case (l, d) => (d, l) } match { case (l, d) => (l, d) }
  }

  test("classification matches the replay and picks the right language") {
    val probes = Seq(
      (10L, "the cat sat on the mat and the dog sat"),
      (20L, "zug grok blarg nix zug zug grok"))
    for (np <- Seq(1, 5)) {
      val trainDf = train.toDF("doc_id", "lang", "text").repartition(np)
      val prof = LangIdProfiles.trainProfiles(trainDf, "lang", "text", topK = 50)
      val got = LangIdProfiles.classify(
        probes.toDF("doc_id", "text").repartition(np), "doc_id", "text",
        prof, topM = 20, penalty = 50L)
        .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      for ((id, text) <- probes)
        assert(got(id) == refClassify(text, 50, 20, 50L), s"doc $id np=$np")
      assert(got(10L)._1 == "aa" && got(20L)._1 == "bb", got)
    }
  }

  test("documents under three characters never classify") {
    val prof = LangIdProfiles.trainProfiles(
      train.toDF("doc_id", "lang", "text"), "lang", "text")
    assert(LangIdProfiles.classify(
      Seq((9L, "ab")).toDF("doc_id", "text"), "doc_id", "text", prof).isEmpty)
  }
}
