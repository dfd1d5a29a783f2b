package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C4 §2.2 line/page cleaning rules on real prose fixtures — the synthetic
  * corpus has no line structure or terminal punctuation, so q59 drives the
  * same functions over the deterministic multi-line rewrap while the rule
  * semantics are pinned here.
  */
class C4Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def clean(text: String): String =
    Seq(text).toDF("t").select(TextFunctions.c4CleanText(col("t")).as("c"))
      .as[String].collect()(0)

  private def keep(text: String): Boolean =
    Seq(text).toDF("t")
      .select(TextFunctions.c4PageKeep(TextFunctions.c4CleanText(col("t"))).as("k"))
      .collect()(0).getBoolean(0)

  test("line rule keeps punctuated ≥5-word lines and drops the rest") {
    val doc = Seq(
      "This is a fine sentence about engines.",   // kept
      "too short.",                               // < 5 words
      "No terminal punctuation on this line",     // no terminal punctuation
      "Site uses javascript for tracking today.", // javascript mention
      "Another good sentence appears right here!" // kept
    ).mkString("\n")
    assert(clean(doc) ==
      "This is a fine sentence about engines.\nAnother good sentence appears right here!")
  }

  test("closing quotes and brackets after terminal punctuation still count") {
    assert(clean("He said the words \"this really works.\"") ==
      "He said the words \"this really works.\"")
    assert(clean("A bracketed aside sits here (like this.)") ==
      "A bracketed aside sits here (like this.)")
  }

  test("page rule needs ≥3 sentences and rejects lorem ipsum / braces") {
    val three = "One good sentence sits right here. " +
      "Two good sentences sit right here. Three good sentences sit right here."
    assert(keep(three))
    assert(!keep("Only one good sentence is here."))
    assert(!keep(three + "\nSome lorem ipsum filler text remains here."))
    assert(!keep(three.replace("Three", "A value like {braces} in three")))
  }

  test("a page with no kept lines cleans to the empty string, not null") {
    val r = Seq("no punctuation here at all")
      .toDF("t").select(TextFunctions.c4CleanText(col("t")).as("c")).collect()(0)
    assert(!r.isNullAt(0) && r.getString(0) == "")
  }
}
