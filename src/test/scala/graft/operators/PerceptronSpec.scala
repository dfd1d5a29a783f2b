package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch perceptron invariants: round-for-round parity with an
  * in-memory reference, partitioning invariance (the update is a
  * commutative integer sum), convergence to a zero-mistake separator on
  * linearly separable data, the zero-margin-counts-as-mistake rule that
  * makes round 1 well-defined, and the scoring pass. Independent
  * end-to-end check: the q137/q138 oracles (5 rounds unrolled).
  */
class PerceptronSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // linearly separable in 2D + bias: y = +1 iff x1 + x2 > 6
  private lazy val sep: Seq[(Long, Seq[Long], Long)] = (0 until 60).map { i =>
    val a = (i * 7) % 10
    val b = (i * 3) % 10
    (i.toLong, Seq(1L, a.toLong, b.toLong), if (a + b > 6) 1L else -1L)
  }

  private def refTrain(data: Seq[(Seq[Long], Long)], dim: Int,
                       rounds: Int): Seq[Array[Long]] = {
    var w = Array.fill(dim)(0L)
    val hist = Seq.newBuilder[Array[Long]]
    for (_ <- 1 to rounds) {
      val upd = Array.fill(dim)(0L)
      data.foreach { case (x, y) =>
        val m = (0 until dim).map(j => w(j) * x(j)).sum
        if (y * m <= 0L) (0 until dim).foreach(j => upd(j) += y * x(j))
      }
      w = Array.tabulate(dim)(j => w(j) + upd(j))
      hist += w
    }
    hist.result()
  }

  test("training history matches the reference round for round") {
    val df = sep.toDF("id", "x", "y")
    val got = Perceptron.trainWeights(df, "x", "y", dim = 3, rounds = 6)
    val exp = refTrain(sep.map(t => (t._2, t._3)), 3, 6)
    assert(got.map(_.toSeq) == exp.map(_.toSeq))
  }

  test("weights are invariant to partitioning") {
    val df = sep.toDF("id", "x", "y")
    val w1 = Perceptron.trainWeights(df.repartition(1), "x", "y", 3, 4)
    val w32 = Perceptron.trainWeights(df.repartition(32), "x", "y", 3, 4)
    assert(w1.map(_.toSeq) == w32.map(_.toSeq))
  }

  test("converges to a zero-mistake separator on separable data") {
    val df = sep.toDF("id", "x", "y")
    val w = Perceptron.trainWeights(df, "x", "y", 3, 60).last
    val wrong = sep.count { case (_, x, y) =>
      val m = (0 until 3).map(j => w(j) * x(j)).sum
      y * m <= 0L
    }
    assert(wrong == 0, s"final weights ${w.toSeq} still make $wrong mistakes")
  }

  test("round 1 from zero weights treats every row as misclassified") {
    val df = sep.toDF("id", "x", "y")
    val w1 = Perceptron.trainWeights(df, "x", "y", 3, 1).head
    val exp = Array.fill(3)(0L)
    sep.foreach { case (_, x, y) =>
      (0 until 3).foreach(j => exp(j) += y * x(j)) }
    assert(w1.toSeq == exp.toSeq)
  }

  test("score returns the exact margin and its sign") {
    val df = sep.toDF("id", "x", "y")
    val w = Perceptron.trainWeights(df, "x", "y", 3, 60).last
    val scored = Perceptron.score(df, "id", "x", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    sep.foreach { case (id, x, y) =>
      val m = w.indices.map(j => w(j) * x(j)).sum
      assert(scored(id) == (m, if (m > 0) 1 else -1))
      assert((if (m > 0) 1 else -1) == y.toInt) // converged separator
    }
  }

  test("trainHistory flattens to (round, idx, weight)") {
    val df = sep.toDF("id", "x", "y")
    val flat = Perceptron.trainHistory(df, "x", "y", 3, 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val hist = Perceptron.trainWeights(df, "x", "y", 3, 2)
    assert(flat.size == 6)
    for (r <- 0 until 2; j <- 0 until 3)
      assert(flat((r + 1, j)) == hist(r)(j))
  }
}
