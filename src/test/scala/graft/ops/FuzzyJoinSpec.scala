package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FastSS deletion-neighborhood linkage vs the quadratic ground truth: the
  * blocking must be LOSSLESS (every levenshtein<=d pair shares a variant)
  * and the verify exact, so blocked output == brute-force output on a
  * vocabulary covering substitutions, insertions, deletions, transpositions
  * (distance 2), empty and single-char strings.
  */
class FuzzyJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // deterministic vocabulary: per base word, an identity, a deletion, a
  // substitution, and an append — plus degenerate strings
  private lazy val records = {
    val bases = Seq("hospital", "trust", "mersey", "barts", "leeds",
      "oxford", "cambridge", "york", "derby", "exeter")
    val mutated = bases.zipWithIndex.flatMap { case (w, i) =>
      Seq(
        (i * 10 + 0, w),
        (i * 10 + 1, w.patch(i % w.length, "", 1)),          // deletion
        (i * 10 + 2, w.updated((i + 3) % w.length, 'z')),     // substitution
        (i * 10 + 3, w + "s"),                                // insertion
        (i * 10 + 4, w.reverse))                              // far string
    }
    (mutated ++ Seq((900, ""), (901, "a"), (902, "b"), (903, "ab"), (904, "ba")))
      .toDF("id", "name")
  }

  private def brute(d: Int) = {
    val a = records.select(col("id").as("id_a"), col("name").as("name_a"))
    val b = records.select(col("id").as("id_b"), col("name").as("name_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= d)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
  }

  private def blocked(d: Int) =
    FuzzyJoin.linkSelf(records, "id", "name", d)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet

  test("d=1: blocked linkage equals the brute-force pair set") {
    val exact = brute(1)
    assert(exact.nonEmpty, "fixture must produce distance-1 pairs")
    assert(blocked(1) == exact)
  }

  test("d=2: blocked linkage equals the brute-force pair set (incl. transpositions)") {
    val exact = brute(2)
    assert(exact.exists(_._3 == 2L), "fixture must produce distance-2 pairs")
    // 'ab' vs 'ba' is the classic transposition = two substitutions
    assert(exact.contains((903, 904, 2L)))
    assert(blocked(2) == exact)
  }

  test("empty and single-char strings link through the empty variant") {
    val exact1 = brute(1)
    assert(exact1.contains((900, 901, 1L)), "'' vs 'a' is one insertion")
    assert(exact1.contains((901, 902, 1L)), "'a' vs 'b' is one substitution")
  }

  test("deletion neighborhood size and content are the expected set") {
    val vs = records.filter(col("id") === 903) // "ab"
      .select(FuzzyJoin.deletionVariants(col("name"), 1).as("v"))
      .head().getSeq[String](0).toSet
    assert(vs == Set("ab", "a", "b"))
    val vs2 = records.filter(col("id") === 903)
      .select(FuzzyJoin.deletionVariants(col("name"), 2).as("v"))
      .head().getSeq[String](0).toSet
    assert(vs2 == Set("ab", "a", "b", ""))
  }

  test("two-sided link keeps cross-frame direction and exact distances") {
    val l = Seq((1, "acme ltd"), (2, "zzz")).toDF("lid", "lname")
    val r = Seq((10, "acme ltd"), (11, "acme ltd."), (12, "acmeltd")).toDF("rid", "rname")
    val out = FuzzyJoin.link(l, r, "lid", "lname", "rid", "rname", 1)
      .select("id_a", "id_b", "dist")
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2))).toSet
    assert(out == Set((1, 10, 0L), (1, 11, 1L), (1, 12, 1L)))
  }

  test("refuses distances beyond the neighborhood design range") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.deletionVariants(col("x"), 3)
    }
  }
}
