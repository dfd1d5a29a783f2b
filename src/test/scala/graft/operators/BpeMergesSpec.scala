package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning invariants: the per-round choice rule (count,
  * then lexicographic), the greedy non-overlapping fuse incl. the
  * left=right run case, parity of the full loop against an in-memory
  * reference implementation, null-element safety of the native fuse
  * expression, and partitioning invariance. The independent end-to-end
  * checks are the q131/q132 oracles (4 rounds unrolled in SQL).
  */
class BpeMergesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // in-memory reference: same contract, naive Scala
  private def refLearn(docs: Seq[Seq[String]], rounds: Int)
      : (Seq[Seq[String]], Seq[(String, String, Long)]) = {
    var st = docs
    val rules = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = st.flatMap(s => s.zip(s.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        rules += ((a, b, c))
        st = st.map { s =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              out += (a + " " + b); i += 2
            } else { out += s(i); i += 1 }
          }
          out.result()
        }
      }
    }
    (st, rules.result())
  }

  private val corpus: Seq[(Long, Seq[String])] = Seq(
    (1L, Seq("the", "quick", "fox", "jumps", "the", "quick", "dog")),
    (2L, Seq("a", "a", "a", "a", "a")),                 // left=right run
    (3L, Seq("the", "quick", "fox", "the", "quick")),
    (4L, Seq("b", "the", "quick", "b")),
    (5L, Seq("lone")),                                   // no pairs
    (6L, Seq.empty[String]))

  test("learned rules and final state match the reference over 4 rounds") {
    val df = corpus.toDF("doc_id", "toks")
    val (refSt, refRules) = refLearn(corpus.map(_._2), 4)
    val (st, rules) = BpeMerges.learn(df, "doc_id", "toks", 4)
    assert(rules.map(r => (r.left, r.right, r.count)) == refRules)
    val got = st.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val exp = corpus.map(_._1).zip(refSt).toMap
    assert(got == exp)
  }

  test("greedy fuse keeps the 1st, 3rd, ... of an overlapping run") {
    val df = Seq((1L, Seq("a", "a", "a", "a", "a"))).toDF("doc_id", "toks")
    val (st, rules) = BpeMerges.learn(df, "doc_id", "toks", 1)
    assert(rules.head.left == "a" && rules.head.right == "a" &&
      rules.head.count == 4L)
    assert(st.collect().head.getSeq[String](1) == Seq("a a", "a a", "a"))
  }

  test("tie on count breaks to the lexicographically smallest pair") {
    val df = Seq((1L, Seq("z", "y")), (2L, Seq("b", "a"))).toDF("doc_id", "toks")
    val (_, rules) = BpeMerges.learn(df, "doc_id", "toks", 1)
    assert(rules.head.left == "b" && rules.head.right == "a")
  }

  test("rules are invariant to partitioning") {
    val df = corpus.toDF("doc_id", "toks")
    val r1 = BpeMerges.merges(df.repartition(1), "doc_id", "toks", 3)
      .collect().map(_.toSeq).toSeq
    val r32 = BpeMerges.merges(df.repartition(32), "doc_id", "toks", 3)
      .collect().map(_.toSeq).toSeq
    assert(r1 == r32)
  }

  test("native fuse expression passes null elements through unfused") {
    val df = Seq((1L, Seq("a", null, "a", "a"))).toDF("doc_id", "toks")
    val fused = df.select(org.apache.spark.sql.GraftColumnBridge.column(
      BpeMergeExpr(org.apache.spark.sql.GraftColumnBridge.expression(col("toks")),
        "a", "a")).as("out"))
      .collect().head.getSeq[String](0)
    assert(fused == Seq("a", null, "a a"))
  }

  test("applyRules on the training corpus reproduces learn's final state") {
    val df = corpus.toDF("doc_id", "toks")
    val (st, rules) = BpeMerges.learn(df, "doc_id", "toks", 4)
    val applied = BpeMerges.applyRules(df, "doc_id", "toks", rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val learned = st.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(applied == learned)
  }

  test("applyRules encodes UNSEEN text with the frozen vocabulary, one scan") {
    val train = corpus.toDF("doc_id", "toks")
    val (_, rules) = BpeMerges.learn(train, "doc_id", "toks", 2)
    val fresh = Seq((100L, Seq("the", "quick", "brown", "the", "quick")))
      .toDF("doc_id", "toks")
    val out = BpeMerges.applyRules(fresh, "doc_id", "toks", rules)
    assert(out.collect().head.getSeq[String](1).contains("the quick"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1200))
  }

  test("stops cleanly when the corpus fuses below any pair") {
    val df = Seq((1L, Seq("x", "y"))).toDF("doc_id", "toks")
    val (st, rules) = BpeMerges.learn(df, "doc_id", "toks", 10)
    assert(rules.length == 1) // after fusing (x,y) no pairs remain
    assert(st.collect().head.getSeq[String](1) == Seq("x y"))
  }
}
