package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Collocation-lift invariants: matches a driver-side integer replay, is
  * invariant to input partitioning, respects the support floor, and
  * ranks a true collocation above an incidental pair. The independent
  * end-to-end check is the q181 oracle.
  */
class CollocationsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // "new york" is a collocation (always together); "the of" never occurs;
  // "the cat" is incidental (both parts frequent elsewhere)
  private val corpus = Seq(
    (1L, Seq("the", "cat", "sat", "in", "new", "york")),
    (2L, Seq("new", "york", "is", "the", "city")),
    (3L, Seq("the", "dog", "sat", "on", "the", "cat")),
    (4L, Seq("cat", "and", "dog", "in", "new", "york")),
    (5L, Seq("solo")),
    (6L, Seq[String]()))

  private val scale = 1000000L

  private def replay(minCount: Long): Map[(String, String), (Long, Long)] = {
    val bgs = corpus.flatMap(_._2.sliding(2).filter(_.size == 2).map {
      case Seq(a, b) => (a, b) })
    val cab = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val uni = corpus.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = corpus.map(_._2.size).sum.toLong
    cab.filter(_._2 >= minCount).map { case ((a, b), c) =>
      (a, b) -> (c, scale * c * n / (uni(a) * uni(b))) }
  }

  private def run(minCount: Long, np: Int = 1): Map[(String, String), (Long, Long)] =
    Collocations.bigramLift(
      corpus.toDF("doc_id", "toks").repartition(np), "doc_id", "toks", minCount)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("bigramLift matches the driver replay at several partitionings") {
    for (np <- Seq(1, 3, 7)) assert(run(1, np) == replay(1), s"np=$np")
  }

  test("support floor drops singletons; collocation outranks incidental pair") {
    val got = run(2)
    assert(got == replay(2))
    assert(got.forall(_._2._1 >= 2)) // every surviving pair has support >= 2
    assert(!got.contains(("cat", "sat"))) // support 1: floored out
    // "new york" (always together) outranks "the cat" (incidental — both
    // parts frequent apart)
    assert(got(("new", "york"))._2 > got(("the", "cat"))._2)
  }
}
