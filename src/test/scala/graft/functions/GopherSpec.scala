package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Repetition / quality-filter signals (Gopher §A1.1, C4 §2.2) on
  * handcrafted multi-line fixtures — the driver corpus is single-line, so
  * the line-level signals are pinned here.
  */
class GopherSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Option[Double] = {
    val r = Seq(text).toDF("t").select(c.cast("double").as("v")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("dupLineFraction counts repeated non-empty lines") {
    val doc = "alpha beta\ngamma\nalpha beta\n\nalpha beta\n"
    // lines after blank-drop: [alpha beta, gamma, alpha beta, alpha beta]
    assert(one(doc, TextFunctions.dupLineFraction(col("t"))).contains(0.5))
    assert(one("", TextFunctions.dupLineFraction(col("t"))).isEmpty)
    assert(one("single line", TextFunctions.dupLineFraction(col("t"))).contains(0.0))
  }

  test("dupTokenFraction and topNgramFraction measure repetition") {
    val doc = "spam spam spam eggs"
    assert(one(doc, TextFunctions.dupTokenFraction(col("t"))).contains(0.5))
    // bigrams: [spam spam, spam spam, spam eggs] -> mode 2, *2/4 tokens = 1.0
    assert(one(doc, TextFunctions.topNgramFraction(col("t"), 2)).contains(1.0))
    // fewer tokens than n -> null
    assert(one("one two", TextFunctions.topNgramFraction(col("t"), 3)).isEmpty)
    val varied = "a b c d e f g h"
    assert(one(varied, TextFunctions.dupTokenFraction(col("t"))).contains(0.0))
    assert(one(varied, TextFunctions.topNgramFraction(col("t"), 2)).contains(0.25))
  }

  test("bullet / ellipsis line fractions") {
    val doc = "- first item\n- second item\nplain text\nteaser ends...\n• third"
    // bullets need a trailing space after the marker: three of five lines
    assert(one(doc, TextFunctions.bulletLineFraction(col("t"))).contains(0.6))
    assert(one(doc, TextFunctions.ellipsisLineFraction(col("t"))).contains(0.2))
  }

  test("symbolToWordRatio bills hashes and ellipses per token") {
    assert(one("tag #one and #two plus more...",
      TextFunctions.symbolToWordRatio(col("t"))).contains(0.5))
  }

  test("dupNgramFraction measures duplicated n-gram mass") {
    // 15 tokens; "a b c d e" is the only repeated 5-gram (2 of 11 grams)
    val doc = "a b c d e a b c d e x y z w v"
    assert(one(doc, TextFunctions.dupNgramFraction(col("t"), 5)).contains(2.0 / 11))
    // every 5-gram identical -> all grams duplicated
    assert(one("x x x x x x", TextFunctions.dupNgramFraction(col("t"), 5)).contains(1.0))
    // fewer tokens than n -> null
    assert(one("a b c", TextFunctions.dupNgramFraction(col("t"), 5)).isEmpty)
    assert(one("a b c d e f g h", TextFunctions.dupNgramFraction(col("t"), 5)).contains(0.0))
  }

  test("alphaWordFraction measures words containing an alphabetic char") {
    // [the, 12, x9, 404, ---] -> 2 of 5 contain a letter
    assert(one("the 12 x9 404 ---",
      TextFunctions.alphaWordFraction(col("t"))).contains(0.4))
    assert(one("", TextFunctions.alphaWordFraction(col("t"))).isEmpty)
  }

  test("topNgramFraction on a 50k-token document completes in seconds") {
    // 50k tokens with a planted 1.2k-run of one bigram: the sort+run-length
    // mode is O(g log g) per row — the previous distinct×scan fold was
    // O(g²) (~2.5e9 string comparisons here) and would take minutes.
    val planted = Seq.fill(600)("buy now").mkString(" ")
    val rest = (1 to 48800).map(i => s"tok${i % 9973}x$i").mkString(" ")
    val doc = planted + " " + rest
    val top2 = one(doc, TextFunctions.topNgramFraction(col("t"), 2))
    // "buy now" appears 600 times as a bigram (plus "now buy" 599 times):
    // mode 600, * 2 / 50000 tokens = 0.024
    assert(top2.contains(600.0 * 2 / 50000))
    // the full keep rule also runs without stalling; this doc fails the
    // stopword (no function words) and mean-token-length clauses -> false
    assert(one(doc, TextFunctions.gopherKeep(col("t")).cast("double")).contains(0.0))
  }

  test("gopherKeep accepts prose and rejects each violation class") {
    val goodTokens = (1 to 60).map(i => s"word$i")
    val good = ("the quick brown fox is over the lazy dog and " +
      goodTokens.mkString(" "))
    assert(one(good, TextFunctions.gopherKeep(col("t")).cast("double")).contains(1.0))

    // too short (under 50 tokens) -> false, never null
    assert(one("tiny doc", TextFunctions.gopherKeep(col("t")).cast("double")).contains(0.0))

    // heavy bigram repetition -> top-2-gram fraction over 20%
    val repetitive = "the and of to in is a " + Seq.fill(30)("buy now").mkString(" ") +
      " " + (1 to 30).map(i => s"w$i").mkString(" ")
    assert(one(repetitive, TextFunctions.topNgramFraction(col("t"), 2)).exists(_ > 0.2))
    assert(one(repetitive, TextFunctions.gopherKeep(col("t")).cast("double")).contains(0.0))

    // bullet-soup document -> over 90% bullet lines
    val bullets = "the and of is to in a intro line\n" +
      (1 to 60).map(i => s"- item number $i with words").mkString("\n")
    assert(one(bullets, TextFunctions.bulletLineFraction(col("t"))).exists(_ >= 0.9))
    assert(one(bullets, TextFunctions.gopherKeep(col("t")).cast("double")).contains(0.0))
  }
}
