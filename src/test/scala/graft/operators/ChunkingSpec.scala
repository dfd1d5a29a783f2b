package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Reference chunker: plain Scala over the same token rule. */
  private def naive(text: String, max: Int, stride: Int): Seq[(Long, String, Long)] = {
    val ts = "\\S+".r.findAllIn(text).toVector
    if (ts.isEmpty) Seq.empty
    else {
      val last = (math.max(ts.size - max, 0) + stride - 1) / stride
      (0 to last).map { i =>
        val w = ts.slice(i * stride, i * stride + max)
        (i.toLong, w.mkString(" "), w.size.toLong)
      }
    }
  }

  test("chunkByTokens equals the naive chunker across sizes and strides") {
    val texts = Seq(
      "",                          // token-less: no rows
      "   ",                       // whitespace only: no rows
      "one",
      "a b c d",
      (1 to 10).map("t" + _).mkString(" "),
      (1 to 97).map("w" + _).mkString("  "), // multi-space separators
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for ((max, stride) <- Seq((4, 3), (4, 4), (32, 24), (5, 1), (100, 100))) {
      val got = Chunking.chunkByTokens(df, "text", max, stride)
        .select(col("id"), col("chunk_id"), col("chunk_text"), col("n_chunk_tokens"))
        .as[(Long, Long, String, Long)].collect().toSet
      val expected = texts.zipWithIndex.flatMap { case (t, i) =>
        naive(t, max, stride).map { case (c, s, n) => (i.toLong, c, s, n) }
      }.toSet
      assert(got == expected, s"max=$max stride=$stride")
    }
  }

  test("every token is covered and interior chunks are full-width") {
    val df = Seq((1L, (1 to 50).map("t" + _).mkString(" "))).toDF("id", "text")
    val rows = Chunking.chunkByTokens(df, "text", 8, 5)
      .select(col("chunk_id"), col("n_chunk_tokens")).as[(Long, Long)]
      .collect().sortBy(_._1)
    // starts advance by 5; the last window must reach token 50
    assert(rows.head._1 == 0L)
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    assert(rows.init.forall(_._2 == 8L), "non-final chunks are full width")
    val last = rows.last
    assert(last._1 * 5 + last._2 == 50L, "final chunk ends at the last token")
  }

  test("a document not longer than maxTokens yields exactly one chunk") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val rows = Chunking.chunkByTokens(df, "text", 3, 2)
      .select(col("chunk_id"), col("chunk_text"), col("n_chunk_tokens"))
      .as[(Long, String, Long)].collect()
    assert(rows.toSeq == Seq((0L, "a b c", 3L)))
  }

  test("invalid stride/maxTokens are rejected") {
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException](Chunking.chunkByTokens(df, "text", 4, 5))
    intercept[IllegalArgumentException](Chunking.chunkByTokens(df, "text", 4, 0))
    intercept[IllegalArgumentException](Chunking.chunkByTokens(df, "text", 0, 0))
  }

  test("chunking is per-row work only: no Exchange in the plan") {
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
    val plan = Chunking.chunkByTokens(df, "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
