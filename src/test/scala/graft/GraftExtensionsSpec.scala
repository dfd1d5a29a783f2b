package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions, through a session built with
  * `withExtensions(new GraftExtensions)` — its own session on purpose.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // other suites may already hold the default (extension-less) session in
    // this JVM; clear it so getOrCreate builds a fresh one (sharing the
    // SparkContext) with the extensions applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("graft_* functions are callable from SQL and agree with the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
    df.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT graft_simhash(split(t, ' ')) AS sh,
        |       graft_minhash(graft_shingles(split(t, ' '), 3), 8) AS mh,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d
        |FROM ext_docs""".stripMargin).head()
    val api = df.select(
      graft.functions.SketchExpressions.simhash(split(col("t"), " ")).as("sh"),
      graft.functions.SketchExpressions.minhash(
        graft.functions.SketchExpressions.wordShingles(split(col("t"), " "), 3), 8).as("mh"))
      .head()
    assert(sql.getAs[Long]("sh") == api.getAs[Long]("sh"))
    assert(sql.getSeq[Long](1) == api.getSeq[Long](1))
    assert(sql.getAs[Double]("d") == 11.0)
  }

  test("round-9 expressions reach SQL: first occurrences and the dup-span cut") {
    val r = spark.sql(
      """SELECT graft_first_occurrences(array('a', 'b', 'a', 'c', 'b')) AS fo,
        |       graft_uncovered_tokens(array('t1', 't2', 't3', 't4', 't5'),
        |                              array(2L), 2) AS cut""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a", "b", "c"))
    assert(r.getSeq[String](1) == Seq("t1", "t4", "t5"))
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("graft_minhash"))
  }
}
