package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // benchmark doc shares the 3-gram "the quick fox" with train doc 1 and
  // "jumps over dogs" with train docs 1 and 2; doc 3 is clean
  private def trainDf = Seq(
    (1L, "the quick fox jumps over dogs today"),
    (2L, "it jumps over dogs and cats"),
    (3L, "completely unrelated text with other words"),
    (4L, "short"),
  ).toDF("doc_id", "text")

  private def benchDf = Seq(
    (100L, "watch the quick fox as it jumps over dogs"),
  ).toDF("doc_id", "text")

  test("overlaps counts distinct shared k-grams per contaminated doc") {
    val r = Decontaminate.overlaps(trainDf, benchDf, "doc_id", "text", k = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // doc 1 shares "the quick fox" + "jumps over dogs";
    // doc 2 shares "it jumps over" + "jumps over dogs"
    assert(r(1L) == 2L)
    assert(r(2L) == 2L)
    assert(!r.contains(3L) && !r.contains(4L))
  }

  test("raw-string and hashed gram keys agree") {
    val h = Decontaminate.overlaps(trainDf, benchDf, "doc_id", "text", 3, hashGrams = true)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val s = Decontaminate.overlaps(trainDf, benchDf, "doc_id", "text", 3, hashGrams = false)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(h == s)
  }

  test("clean drops exactly the contaminated docs") {
    val ids = Decontaminate.clean(trainDf, benchDf, "doc_id", "text", k = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(3L, 4L))
  }

  test("repeated grams in one doc count once") {
    val spammy = Seq((9L, "jumps over dogs yes jumps over dogs")).toDF("doc_id", "text")
    val r = Decontaminate.overlaps(spammy, benchDf, "doc_id", "text", k = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(9L) == 1L)
  }

  test("the corpus-side plan probes a broadcast, never shuffles the corpus grams") {
    val p = Decontaminate.overlaps(trainDf, benchDf, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }
}
