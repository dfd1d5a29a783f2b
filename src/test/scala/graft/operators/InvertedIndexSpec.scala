package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InvertedIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (10L, "apple banana apple"),      // duplicate within a doc counts once
    (20L, "banana cherry"),
    (30L, "apple banana banana"),
    (40L, ""),                        // token-less doc contributes nothing
  ).toDF("doc_id", "text")

  test("df counts documents (not occurrences) and postings are sorted") {
    val got = InvertedIndex.postings(docs, "doc_id", "text", maxPostings = 10)
      .select(col("token"), col("df"), col("postings"))
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "apple"  -> (2L, Seq(10L, 30L)),
      "banana" -> (3L, Seq(10L, 20L, 30L)),
      "cherry" -> (1L, Seq(20L))))
  }

  test("maxPostings caps the list but df stays the full document count") {
    val many = (1L to 50L).map(i => (i, "common tok" + i)).toDF("doc_id", "text")
    val got = InvertedIndex.postings(many, "doc_id", "text", maxPostings = 5)
      .filter(col("token") === "common")
      .select(col("df"), col("postings")).as[(Long, Seq[Long])].collect()
    assert(got.toSeq == Seq((50L, Seq(1L, 2L, 3L, 4L, 5L))))
  }

  test("the posting cap trims BEFORE the shuffle (partial WindowGroupLimit)") {
    val plan = InvertedIndex.postings(docs, "doc_id", "text", 10)
      .queryExecution.executedPlan.toString
    // The row_number ≤ cap filter compiles to a map-side WindowGroupLimit:
    // a stop-word's postings never flood the exchange or the list buffer.
    val partialLimit = plan.indexOf("WindowGroupLimit")
    assert(partialLimit >= 0 && plan.contains("Partial"), plan)
    val exchange = plan.indexOf("Exchange hashpartitioning")
    assert(plan.lastIndexOf("WindowGroupLimit") > exchange,
      s"expected a WindowGroupLimit below the exchange:\n$plan")
  }
}
