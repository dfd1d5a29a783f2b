package graft.functions

import graft.SparkSpec
import graft.ops.FuzzyJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full Damerau–Levenshtein semantics, pinned against the oracle engine
  * itself: every fixture distance below was computed by DuckDB's
  * `damerau_levenshtein` (the q250 oracle function), so the native
  * expression and the oracle agree BY MEASUREMENT, not by two readings of
  * the same paper. The "CA"/"ABC" = 2 and "a cat"/"an act" = 2 rows are
  * the discriminators: optimal string alignment (the cheaper restricted
  * variant) gives 3 for both, so any OSA regression fails here first.
  */
class DamerauSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (a, b, DuckDB damerau_levenshtein(a, b)) — generated once with the
  // oracle engine over a transposition-heavy 3-letter alphabet plus the
  // OSA-vs-full-DL discriminator cases; seed 7.
  private val pinned: Seq[(String, String, Int)] = Seq(
    ("ab", "aacab", 3),
    ("acaa", "", 4),
    ("baa", "", 3),
    ("baca", "c", 3),
    ("caccb", "", 5),
    ("a", "abba", 3),
    ("acbc", "caaccc", 3),
    ("b", "", 1),
    ("caca", "abcc", 3),
    ("bbc", "bba", 1),
    ("acaacb", "bbcb", 4),
    ("ca", "", 2),
    ("baba", "bac", 2),
    ("", "ccbbcb", 6),
    ("bcba", "abbcca", 3),
    ("", "cbccc", 5),
    ("bbcbcb", "", 6),
    ("bac", "", 3),
    ("aab", "c", 3),
    ("b", "baa", 2),
    ("bcb", "b", 2),
    ("cbcbbc", "aaa", 6),
    ("a", "c", 1),
    ("a", "cab", 2),
    ("aa", "cbc", 3),
    ("bacc", "ccca", 3),
    ("ccb", "bba", 3),
    ("cba", "a", 2),
    ("b", "a", 1),
    ("", "acab", 4),
    ("aaac", "acb", 3),
    ("cb", "aab", 2),
    ("bbb", "", 3),
    ("a", "bcbbc", 5),
    ("c", "", 1),
    ("c", "ac", 1),
    ("acbc", "acbcba", 2),
    ("ac", "cbca", 3),
    ("aabc", "aacbbc", 2),
    ("", "", 0),
    ("bbbacc", "bc", 4),
    ("ba", "a", 1),
    ("b", "b", 0),
    ("b", "cabc", 3),
    ("ca", "cabcab", 4),
    ("b", "cbacbb", 5),
    ("cac", "a", 2),
    ("CA", "ABC", 2),
    ("ab", "ba", 1),
    ("abc", "acb", 1),
    ("kitten", "sitting", 3),
    ("abcdef", "abcfed", 2),
    ("", "abc", 3),
    ("same", "same", 0),
    ("a cat", "an act", 2),
    ("abcd", "dcba", 3),
    ("xy", "yxxy", 2))

  test("helper matches every DuckDB-pinned distance (full DL, not OSA)") {
    for ((a, b, want) <- pinned) {
      val got = EditDistanceExpressions.dlDistance(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"dl('$a','$b') = $got, DuckDB says $want")
    }
  }

  test("expression through the DataFrame (codegen) path matches the pinned values") {
    val df = pinned.toDF("a", "b", "want")
      .withColumn("got", EditDistanceExpressions.damerauLevenshtein(col("a"), col("b")))
    assert(df.filter(col("got") =!= col("want")).count() == 0L)
  }

  test("symmetry and the DL <= levenshtein bound on the pinned corpus") {
    val df = pinned.toDF("a", "b", "want")
      .withColumn("ab", EditDistanceExpressions.damerauLevenshtein(col("a"), col("b")))
      .withColumn("ba", EditDistanceExpressions.damerauLevenshtein(col("b"), col("a")))
      .withColumn("lev", levenshtein(col("a"), col("b")))
    assert(df.filter(col("ab") =!= col("ba")).count() == 0L)
    assert(df.filter(col("ab") > col("lev")).count() == 0L)
    // and the bound is strict somewhere (the transposition rows)
    assert(df.filter(col("ab") < col("lev")).count() > 0L)
  }

  test("non-ASCII input matches DuckDB's UTF-8 BYTE semantics") {
    // DuckDB's damerau_levenshtein compares UTF-8 bytes, not characters —
    // dl('é','a') = 2 because 'é' is two bytes. Each value below is
    // DuckDB's own output; a code-unit implementation fails every row.
    val utf8Pinned: Seq[(String, String, Int)] = Seq(
      ("é", "a", 2), ("é", "è", 1), ("日本", "本日", 4),
      ("café", "cafe", 2), ("münchen", "munchen", 2), ("naïve", "naive", 2),
      ("żółć", "zolc", 8), ("αβγ", "αγβ", 2), ("😀ab", "ab😀", 4),
      ("schön", "schon", 2), ("été", "ete", 4), ("日本語", "日本", 3),
      ("", "é", 2))
    for ((a, b, want) <- utf8Pinned) {
      val got = EditDistanceExpressions.dlDistance(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"dl('$a','$b') = $got, DuckDB says $want")
    }
  }

  test("null inputs yield null, not a crash") {
    val df = Seq((Some("ab"), None: Option[String]), (None, Some("ba")),
      (None, None), (Some("ab"), Some("ba")))
      .toDF("a", "b")
      .withColumn("d", EditDistanceExpressions.damerauLevenshtein(col("a"), col("b")))
    assert(df.filter(col("d").isNull).count() == 3L)
    assert(df.filter(col("d") === 1).count() == 1L)
  }

  test("linkSelfDamerau equals the brute-force DL<=1 pair set (blocking lossless)") {
    // transposition-heavy vocabulary: ids with swapped adjacent digits are
    // DL 1 / Lev 2 — the pairs radius-1 blocking would MISS
    val records = (0 until 60).map(i => (i, f"Item#$i%04d"))
      .toDF("id", "name")
    val a = records.select(col("id").as("id_a"), col("name").as("name_a"))
    val b = records.select(col("id").as("id_b"), col("name").as("name_b"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dl", EditDistanceExpressions
        .damerauLevenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dl") <= 1)
      .select("id_a", "id_b", "dl")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val blocked = FuzzyJoin.linkSelfDamerau(records, "id", "name")
      .select("id_a", "id_b", "dl")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    assert(blocked == brute)
    // the fixture must actually exercise a transposition-only pair:
    // "Item#0012" vs "Item#0021" is DL 1, Lev 2
    val lev = FuzzyJoin.linkSelfDamerau(records, "id", "name")
      .filter(col("dl") < col("lev")).count()
    assert(lev > 0L, "fixture must contain dl < lev (transposition) pairs")
  }
}
