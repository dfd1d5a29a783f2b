package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** More-like-this invariants: term selection picks the anchor's
  * DISTINCTIVE terms (rare beats frequent-everywhere), the result equals
  * Bm25.topK called with exactly those terms minus the anchor, and the
  * anchor still shapes the corpus statistics. The independent end-to-end
  * check is the q191 oracle (bit-exact doubles via the alphabetical
  * pivot).
  */
class MoreLikeThisSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // "zephyr" and "quartz" are rare (anchor + one other doc each);
  // "the" is everywhere (low rarity — never selected at numTerms = 2).
  // No anchor-ONLY term: df=1 maximizes rarity and would win selection
  // while matching nobody — correct MLT behavior, useless fixture.
  private val docs = Seq(
    (0L, "the zephyr quartz the the the"),
    (1L, "the zephyr wind blows cold tonight here"),
    (2L, "the quartz crystal lattice forms slowly now"),
    (3L, "the market opened higher on tuesday morning"),
    (4L, "a completely unrelated sentence about gardens"))

  test("selects distinctive terms and equals Bm25 over them, anchor excluded") {
    val df = docs.toDF("doc_id", "text").repartition(3)
    val got = MoreLikeThis.topK(df, "doc_id", "text",
      anchorId = 0L, numTerms = 2, topK = 4)
      .as[(Long, Double)].collect().toSeq
    graft.Storage.releaseAll(spark)
    // the two rare terms are the query; docs 1 and 2 each share one
    val want = Bm25.topK(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("zephyr", "quartz"), topK = 4, excludeDocId = Some(0L))
      .as[(Long, Double)].collect().toSeq
    graft.Storage.releaseAll(spark)
    assert(got == want)
    assert(got.map(_._1).toSet == Set(1L, 2L))
    assert(!got.exists(_._1 == 0L))
  }

  test("numTerms beyond the anchor vocabulary just uses every anchor term") {
    val df = docs.toDF("doc_id", "text")
    val got = MoreLikeThis.topK(df, "doc_id", "text",
      anchorId = 0L, numTerms = 50, topK = 5)
      .as[(Long, Double)].collect()
    graft.Storage.releaseAll(spark)
    // every doc shares "the" except doc 4 — it must not appear
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
  }
}
