package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity for every native expression that replaced a built-in
  * formulation this round: the hand-picked edge cases live next to each
  * expression's unit test; THIS suite fuzzes the equivalences over
  * generated unicode text so the claims hold beyond the cases we thought
  * of. Raw ScalaCheck generators with fixed seeds (the bridge artifact
  * isn't in the offline cache); one Spark job per equivalence, all rows
  * compared at once.
  */
class NativeParitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // characters chosen to stress the byte-scan/regex equivalences: ASCII
  // words, every \s char, non-\s unicode whitespace lookalikes, multi-byte
  // chars (2-, 3-, and 4-byte UTF-8), combining marks, and control bytes
  private val charGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r"),
    1 -> Gen.oneOf("\u00A0", "\u2007", "\u202F", "\u3000"), // NOT \s in Java
    1 -> Gen.oneOf("é", "ß", "–", "…", "ﬁ", "中", "😀", "é"),
    1 -> Gen.oneOf(".", "-", "*", "•", "#", "\u0000", "\u0007"))

  private val textGen: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  private val texts: Seq[String] = samples(textGen, 120)

  test("fuzzed: native tokenizer == regexp_extract_all('\\S+') on arbitrary unicode") {
    val rows = texts.toDF("s").select(
      TextFunctions.tokens(col("s")).as("native"),
      TextFunctions.tokensBuiltin(col("s")).as("builtin")).collect()
    rows.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("fuzzed: native line splitter == filter(split('\\n'), nonempty)") {
    val rows = texts.toDF("s").select(
      TextFunctions.docLines(col("s")).as("native"),
      TextFunctions.docLinesBuiltin(col("s")).as("builtin")).collect()
    rows.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("fuzzed: native hash60 == md5 hex/conv chain on arbitrary unicode") {
    val rows = texts.toDF("s").select(
      PortableHash.hash60(col("s")).as("native"),
      PortableHash.hash60Builtin(col("s")).as("builtin")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("fuzzed: native countMatching == size(filter(rlike)) on token arrays") {
    val arrGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, textGen))
    val pattern = "^\\s*[-*•] |\\d"
    val rows = samples(arrGen, 60).toDF("ls").select(
      SketchExpressions.countMatching(col("ls"), pattern).as("native"),
      size(filter(col("ls"), l => l.rlike(pattern))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("fuzzed: native portable MinHash/SimHash == relational forms") {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val nativeM = graft.operators.Dedup
      .minhashSignaturesPortable(docs, "doc_id", "text", shingleK = 2, numHashes = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val relationalM = graft.operators.Dedup
      .minhashSignaturesPortableRelational(docs, "doc_id", "text", shingleK = 2, numHashes = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(nativeM == relationalM)
    val nativeS = graft.operators.Dedup
      .simhash60Portable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val relationalS = graft.operators.Dedup
      .simhash60PortableRelational(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nativeS == relationalS)
  }
}
