package graft.functions

import graft.SparkSpec
import graft.ops.FuzzyJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Jaro–Winkler bit-parity with the oracle engine: every fixture value
  * below is DuckDB's own `jaro_winkler_similarity` output (full double
  * precision), drawn over a mixed alphabet plus the literature classics
  * (MARTHA/MARHTA = 0.9611…, DIXON/DICKSONX) and the conventions that
  * differ between implementations (two empty strings score 0 in DuckDB).
  * The q253 gate hash-compares these doubles raw, so the parity here is
  * load-bearing, not cosmetic.
  */
class JaroWinklerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val pinned: Seq[(String, String, Double)] = Seq(
    ("a2b2d# 2e3", "3e", 0.0),
    ("e", " eb ea", 0.7222222222222223),
    ("3dbdb21#b", "#", 0.0),
    ("", "3", 0.0),
    ("#1e32c", "#d23bd#dcc", 0.6055555555555555),
    ("1b21a113b2", "21 #2ca", 0.46507936507936504),
    ("ba1", "1bec1e", 0.5),
    ("#ec11ee", "abde#b1b12", 0.5738095238095239),
    ("ac#ebbc", "#e", 0.7619047619047619),
    ("bd31b#c", "", 0.0),
    ("3ea323", "ede2 ", 0.5777777777777778),
    ("", "", 0.0),
    ("dbde", "12c 2e2e", 0.4583333333333333),
    ("2e23#1adca", "b23be1#", 0.6047619047619048),
    ("   c1 b21#", "a b # 13 ", 0.6444444444444444),
    ("", "eebd", 0.0),
    ("acc12b", "2ba3#ac3 ", 0.4259259259259259),
    ("22a", "dcde", 0.0),
    ("3", "cb1e2#3", 0.0),
    (" bd", "c 12", 0.5277777777777778),
    ("21e", "", 0.0),
    ("1bd3b1c#2", "1 1a", 0.5740740740740741),
    ("#a3de2db", "#c2dc1", 0.5138888888888888),
    ("31", "e", 0.0),
    ("13b3ad", "e", 0.0),
    ("1c2", "e1#acb", 0.5),
    ("#a", "313 ", 0.0),
    ("ecb", "eabbab21", 0.6388888888888888),
    ("a", "#", 0.0),
    ("e  ecb3", "", 0.0),
    ("1b23", "a3c", 0.0),
    ("3# a", "21b", 0.0),
    ("bdebc122", "d2b32#", 0.5138888888888888),
    ("3d 2c", "3daaee#1c2", 0.6333333333333333),
    ("#", "a3313e23", 0.0),
    ("1#3 ", "1", 0.775),
    ("22", "ca#3dd", 0.0),
    ("b", "c1# b", 0.0),
    ("a", "", 0.0),
    ("", "a", 0.0),
    ("same", "same", 1.0),
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("Supplier#000000001", "Supplier#000000010", 0.9888888888888889))

  test("helper matches every DuckDB-pinned double BIT-FOR-BIT") {
    for ((a, b, want) <- pinned) {
      val got = EditDistanceExpressions.jwSimilarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"jw('$a','$b') = $got, DuckDB says $want")
    }
  }

  test("non-ASCII input matches DuckDB's UTF-8 BYTE semantics bit-for-bit") {
    // DuckDB's jaro_winkler_similarity compares UTF-8 bytes — e.g.
    // jw('日本','本日') = 0.5555… where any code-unit evaluation gives 0.
    // Each double below is DuckDB's own full-precision output.
    val utf8Pinned: Seq[(String, String, Double)] = Seq(
      ("é", "a", 0.0), ("é", "è", 0.6666666666666666),
      ("日本", "本日", 0.5555555555555555),
      ("café", "cafe", 0.8483333333333334),
      ("münchen", "munchen", 0.8821428571428571),
      ("naïve", "naive", 0.8577777777777779),
      ("żółć", "zolc", 0.0), ("αβγ", "αγβ", 0.9611111111111111),
      ("😀ab", "ab😀", 0.7777777777777777),
      ("schön", "schon", 0.8755555555555556),
      ("été", "ete", 0.5111111111111111),
      ("日本語", "日本", 0.9333333333333333), ("", "é", 0.0))
    for ((a, b, want) <- utf8Pinned) {
      val got = EditDistanceExpressions.jwSimilarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"jw('$a','$b') = $got, DuckDB says $want")
    }
  }

  test("expression through the DataFrame (codegen) path matches, and JW is symmetric") {
    val df = pinned.toDF("a", "b", "want")
      .withColumn("got", EditDistanceExpressions.jaroWinkler(col("a"), col("b")))
      .withColumn("rev", EditDistanceExpressions.jaroWinkler(col("b"), col("a")))
    assert(df.filter(col("got") =!= col("want")).count() == 0L)
    assert(df.filter(col("got") =!= col("rev")).count() == 0L)
    assert(df.filter(col("got") < 0.0 || col("got") > 1.0).count() == 0L)
  }

  test("dictionaryMatch equals the window-function argmax (jw DESC, dict_id ASC)") {
    val corpus = Seq((1L, "marhta"), (2L, "dixon"), (3L, "zzz"), (4L, ""))
      .toDF("cid", "cname")
    val dict = Seq((10L, "martha"), (11L, "dickson"), (12L, "zz"), (13L, "zzz"))
      .toDF("did", "dname")
    val got = FuzzyJoin.dictionaryMatch(corpus, "cid", "cname", dict, "did", "dname")
      .select("id", "dict_id", "jw")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = corpus.crossJoin(dict)
      .withColumn("jw", EditDistanceExpressions.jaroWinkler(col("cname"), col("dname")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cid")).orderBy(col("jw").desc, col("did"))))
      .filter(col("rk") === 1)
      .select("cid", "did", "jw")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute)
    // the all-zero row ("" scores 0 against everything) must fall to the
    // LOWEST dictionary id, pinning the tie-break
    assert(got.exists { case (id, did, jw) => id == 4L && did == 10L && jw == 0.0 })

    // the broadcast-sized contract is enforced: an over-limit dictionary
    // is refused loudly instead of building an unbroadcastable side
    val ex = intercept[IllegalArgumentException] {
      FuzzyJoin.dictionaryMatch(corpus, "cid", "cname", dict, "did", "dname",
        maxDictRows = 2L)
    }
    assert(ex.getMessage.contains("maxDictRows"))
  }
}
