package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC invariants: chunks concatenate back to the document, the
  * boundary rule matches a positional (non-incremental) reference
  * recomputation, SHIFT-ROBUSTNESS (a prefix insertion re-synchronizes
  * — fixed-size blocks provably would not), short/empty-text corners,
  * and the repeated-chunk report. Independent end-to-end check: the
  * q139/q140 oracles recompute every window hash in SQL.
  */
class CdcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val W = Cdc.DefaultWindow
  private val B = Cdc.DefaultBase
  private val M = Cdc.DefaultMod
  private val D = Cdc.DefaultDivisor

  // positional reference: recompute each window hash from scratch
  private def refChunks(s: String): Seq[String] = {
    if (s.isEmpty) return Seq.empty
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- 0 to s.length - W) {
      var h = java.math.BigInteger.ZERO
      for (j <- 0 until W)
        h = h.multiply(java.math.BigInteger.valueOf(B))
          .add(java.math.BigInteger.valueOf(s.charAt(i + j)))
          .mod(java.math.BigInteger.valueOf(M))
      if (h.longValueExact() % D == 0L) cuts += i + W
    }
    if (cuts.isEmpty || cuts.last != s.length) cuts += s.length
    (0 +: cuts.toSeq).sliding(2).map(p => s.substring(p(0), p(1))).toSeq
  }

  private def sparkChunks(s: String): Seq[String] =
    Seq(Tuple1(s)).toDF("t").select(Cdc.chunks(col("t")))
      .head().getSeq[String](0)

  private val lorem = ("the quick brown fox jumps over the lazy dog again and " +
    "again while seventeen gray geese graze green grass beside the river " +
    "bank every single morning before dawn breaks over the quiet hills") * 3

  test("chunks match the positional reference and concatenate back") {
    for (s <- Seq(lorem, lorem.take(100), "abc", "", "x" * W)) {
      val got = sparkChunks(s)
      assert(got == refChunks(s), s"len=${s.length}")
      assert(got.mkString == s)
    }
  }

  test("shift-robustness: a prefix insertion re-synchronizes chunking") {
    val shifted = "INSERTED PREFIX " + lorem
    val a = sparkChunks(lorem).toSet
    val b = sparkChunks(shifted).toSet
    val shared = a & b
    assert(shared.nonEmpty,
      "no shared chunks after a prefix shift — boundaries are not content-defined")
    // fixed-size blocks at the same average size share nothing
    val fixA = lorem.grouped(64).toSet
    val fixB = shifted.grouped(64).toSet
    assert((fixA & fixB).isEmpty, "sanity: fixed blocks must all shift")
  }

  test("short and empty texts: one chunk below the window, none when empty") {
    assert(sparkChunks("") == Seq.empty)
    assert(sparkChunks("short") == Seq("short"))
    assert(sparkChunks("a" * (W - 1)) == Seq("a" * (W - 1)))
  }

  test("inventory explodes (doc, idx, len, hash) consistently") {
    val df = Seq((1L, lorem), (2L, "tiny")).toDF("doc_id", "text")
    val inv = Cdc.inventory(df, "doc_id", "text").collect()
    val byDoc = inv.groupBy(_.getLong(0))
    assert(byDoc(1L).map(_.getInt(1)).sorted.toSeq ==
      (1 to refChunks(lorem).length))
    assert(byDoc(1L).map(_.getLong(2)).sum == lorem.length.toLong)
    assert(byDoc(2L).map(r => (r.getInt(1), r.getLong(2))).toSeq == Seq((1, 4L)))
  }

  test("repeatedChunks surfaces cross-document shared content") {
    val df = Seq((1L, lorem), (2L, "PREFIX " + lorem), (3L, "unrelated text"))
      .toDF("doc_id", "text")
    val rep = Cdc.repeatedChunks(df, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.nonEmpty)
    assert(rep.forall(_._3 > 1))
    assert(rep.exists(_._2 == 2L), "some chunk must span both shifted docs")
  }
}
