package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    (1L, "a", 1), (1L, "b", 2), (2L, "c", 3), (3L, "d", 4),
  ).toDF("k", "tag", "v")
  private def dim = Seq((1L, "x"), (2L, "y"), (9L, "z")).toDF("k", "attr")

  test("saltedJoin is row-identical to the plain join, inner and left") {
    for (jt <- Seq("inner", "left")) {
      val plain = fact.join(dim, Seq("k"), jt).collect().toSet
      val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), Seq("k", "tag"), 4, jt)
        .collect().toSet
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("a hot key's rows really spread across multiple salts") {
    val hot = (1 to 200).map(i => (7L, s"row$i", i)).toDF("k", "tag", "v")
    val nSalts = hot
      .select(pmod(xxhash64(col("k"), col("tag")), lit(4)).as("s"))
      .distinct().count()
    assert(nSalts > 1, "the per-row discriminator must fan one key out")
    // and the join over the salted layout still returns every row
    val out = SkewJoin.saltedJoin(hot, Seq((7L, "d")).toDF("k", "attr"),
      Seq("k"), Seq("k", "tag"), 4)
    assert(out.count() == 200)
  }

  test("the shuffle join keys include the salt (plan pin)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val p = SkewJoin.saltedJoin(fact, dim, Seq("k"), Seq("k", "tag"), 4)
        .queryExecution.executedPlan.toString
      assert(p.contains("__salt"), p.take(1200))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "with broadcast disabled the join must shuffle on (key, salt):\n" + p.take(1200))
    }
  }
}
