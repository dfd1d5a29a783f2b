package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int,
                  minCount: Long = 2L): Map[Long, (Long, Long, Long, Double)] = {
    val df = docs.toDF("doc_id", "text")
    SubstringDedup.dupSpanStats(df, "doc_id", "text", k, minCount)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("a shared k-gram marks exactly its k tokens in both docs") {
    // "a b c" appears in both docs at k=3; surrounding tokens are unique.
    val got = run(Seq(
      0L -> "x1 x2 a b c x3 x4",
      1L -> "y1 a b c y2 y3 y4"), k = 3)
    assert(got(0L) == ((7L, 1L, 3L, 3.0 / 7.0)))
    assert(got(1L) == ((7L, 1L, 3L, 3.0 / 7.0)))
  }

  test("overlapping duplicated grams union their intervals (gap < k)") {
    // "a b c d" shared: two 3-grams at starts 1,2 → covered = 3 + min(3,1) = 4.
    val got = run(Seq(
      0L -> "a b c d z1 z2",
      1L -> "w1 w2 a b c d"), k = 3)
    assert(got(0L) == ((6L, 2L, 4L, 4.0 / 6.0)))
    assert(got(1L) == ((6L, 2L, 4L, 4.0 / 6.0)))
  }

  test("disjoint duplicated spans in one doc sum their coverage") {
    // doc 0 shares "a b c" (pos 1) and "p q r" (pos 7) with doc 1/2;
    // gap >= k so coverage = 3 + 3.
    val got = run(Seq(
      0L -> "a b c m1 m2 m3 p q r",
      1L -> "a b c n1 n2 n3 n4 n5",
      2L -> "o1 o2 o3 o4 o5 p q r"), k = 3)
    assert(got(0L) == ((9L, 2L, 6L, 6.0 / 9.0)))
  }

  test("within-document repetition alone reaches minCount") {
    val got = run(Seq(0L -> "a b c z1 z2 a b c", 1L -> "u1 u2 u3"), k = 3)
    // "a b c" occurs twice inside doc 0 → duplicated; covered 3 + 3.
    assert(got(0L) == ((8L, 2L, 6L, 6.0 / 8.0)))
    assert(got(1L) == ((3L, 0L, 0L, 0.0)))
  }

  test("short and empty docs report zeros but stay in the output") {
    val got = run(Seq(0L -> "a b", 1L -> "", 2L -> "a b c", 3L -> "a b c"),
      k = 3)
    assert(got(0L) == ((2L, 0L, 0L, 0.0)))
    assert(got(1L) == ((0L, 0L, 0L, 0.0)))
    assert(got(2L) == ((3L, 1L, 3L, 1.0)))
    assert(got(3L) == ((3L, 1L, 3L, 1.0)))
  }

  test("raising minCount demotes grams below the threshold") {
    val docs = Seq(0L -> "a b c x1", 1L -> "a b c x2", 2L -> "a b c x3")
    assert(run(docs, k = 3, minCount = 3L)(0L)._2 == 1L) // 3 occurrences
    assert(run(docs, k = 3, minCount = 4L)(0L)._2 == 0L)
  }

  private def runRemove(docs: Seq[(Long, String)], k: Int,
                        minCount: Long = 2L): Map[Long, (Long, Long, String)] = {
    val df = docs.toDF("doc_id", "text")
    SubstringDedup.removeDupSpans(df, "doc_id", "text", k, minCount)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("removeDupSpans cuts exactly the covered tokens and keeps the rest in order") {
    val got = runRemove(Seq(
      0L -> "x1 x2 a b c x3 x4",
      1L -> "y1 a b c y2 y3 y4"), k = 3)
    assert(got(0L) == ((7L, 4L, "x1 x2 x3 x4")))
    assert(got(1L) == ((7L, 4L, "y1 y2 y3 y4")))
  }

  test("removeDupSpans: kept count complements dupSpanStats coverage on every doc") {
    val docs = Seq(
      0L -> "a b c d z1 z2",
      1L -> "w1 w2 a b c d",
      2L -> "a b c z1 z2 a b c",     // within-doc repetition
      3L -> "only unique tokens here",
      4L -> "",
      5L -> "a b")                   // shorter than k
    val stats = run(docs, k = 3)
    val removed = runRemove(docs, k = 3)
    docs.foreach { case (id, _) =>
      val (n, _, dupTokens, _) = stats(id)
      val (n2, kept, _) = removed(id)
      assert(n == n2 && n - kept == dupTokens, s"doc $id")
    }
    // fully-duplicated doc 2 loses everything covered: both "a b c" copies
    assert(removed(2L)._3 == "z1 z2")
  }

  private def runOverlap(docs: Seq[(String, String)], k: Int,
                         cap: Int = 64): Map[(String, String), Long] = {
    val df = docs.toDF("source", "text")
    SubstringDedup.crossSourceOverlap(df, "text", "source", k, cap)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
  }

  test("crossSourceOverlap counts distinct shared grams per source pair") {
    val got = runOverlap(Seq(
      "A" -> "a b c x1 x2",
      "A" -> "a b c x3 x4",        // same gram twice in A — still ONE distinct gh
      "B" -> "y1 a b c y2",
      "B" -> "p q r y3 y4",
      "C" -> "p q r z1 z2 a b c"), k = 3)
    assert(got(("A", "B")) == 1L)  // "a b c"
    assert(got(("A", "C")) == 1L)  // "a b c"
    assert(got(("B", "C")) == 2L)  // "a b c" and "p q r"
    assert(!got.contains(("B", "A")), "only upper-triangle pairs")
  }

  test("crossSourceOverlap drops grams above the source cap as boilerplate") {
    val boiler = "w1 w2 w3"  // in every source
    val docs = Seq("A", "B", "C", "D").map(s => s -> s"$boiler uniq_$s")
    assert(runOverlap(docs, k = 3).isEmpty == false)
    // cap 3 < 4 sources → the only shared gram is excluded everywhere
    assert(runOverlap(docs, k = 3, cap = 3).isEmpty)
  }

  test("crossSourceOverlap: randomized parity with a naive driver reference") {
    val rnd = new scala.util.Random(53)
    (1 to 3).foreach { trial =>
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
      val docs: Seq[(String, String)] = (0 until 30).map { i =>
        val src = s"s${rnd.nextInt(5)}"
        src -> Seq.fill(4 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val k = 2
      val got = runOverlap(docs, k)
      // naive reference: distinct (source, gram-string) pairs, per-gram
      // source sets, upper-triangle counts (no cap hit at 5 sources)
      val grams = docs.flatMap { case (src, text) =>
        val ws = text.split("\\s+").filter(_.nonEmpty)
        ws.sliding(k).filter(_.length == k).map(g => (src, g.mkString("\u001f")))
      }.distinct
      val bySources = grams.groupBy(_._2).values
        .map(_.map(_._1).distinct.sorted).filter(_.size >= 2)
      val want = bySources.flatMap(ss =>
        for (i <- ss.indices; j <- i + 1 until ss.size) yield (ss(i), ss(j)))
        .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      assert(got == want, s"trial $trial")
    }
  }

  test("native uncoveredTokens matches the exists-per-token builtin form") {
    import org.apache.spark.sql.functions.col
    val rows: Seq[(Seq[String], Seq[Long])] = Seq(
      (Seq("t1", "t2", "t3", "t4", "t5"), Seq(2L)),
      (Seq("t1", "t2", "t3", "t4", "t5"), Seq(1L, 3L)),     // overlapping
      (Seq("t1", "t2", "t3"), Seq.empty[Long]),
      (Seq.empty[String], Seq.empty[Long]),
      (Seq("t1", "t2", "t3", "t4", "t5", "t6"), Seq(1L, 4L)))  // adjacent
    val df = rows.toDF("ts", "ss")
    Seq(1, 2, 3).foreach { k =>
      val r = df.select(
        SubstringDedup.uncoveredTokens(col("ts"), col("ss"), k).as("native"),
        SubstringDedup.uncoveredTokensBuiltin(col("ts"), col("ss"), k).as("builtin"))
      r.collect().foreach { row =>
        assert(row.getSeq[String](0) == row.getSeq[String](1), s"k=$k $row")
      }
    }
  }

  test("uncoveredTokens null-element parity: null tokens kept as null, null starts cover nothing") {
    // SQL callers (graft_uncovered_tokens) can pass arrays with null
    // elements; the builtin form keeps an uncovered null token (its lambda
    // never reads the value) and a null start's predicate is null (filter
    // excludes it — covers nothing). The native two-pointer path must agree
    // rather than reading garbage from an UnsafeArrayData null slot.
    import org.apache.spark.sql.functions.col
    // build via Rows so a null Long survives into an array<bigint>
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.types.StructField("ss",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    val data = Seq(
      org.apache.spark.sql.Row(Seq("t1", null, "t3", "t4", null), Seq(2L)),
      org.apache.spark.sql.Row(Seq(null, "t2", "t3"), Seq.empty[Long]),
      org.apache.spark.sql.Row(Seq("t1", "t2", "t3", "t4"), Seq(null, 3L)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
    Seq(1, 2, 3).foreach { k =>
      val r = df.select(
        SubstringDedup.uncoveredTokens(col("ts"), col("ss"), k).as("native"),
        SubstringDedup.uncoveredTokensBuiltin(col("ts"), col("ss"), k).as("builtin"))
      r.collect().foreach { row =>
        assert(row.getSeq[String](0) == row.getSeq[String](1), s"k=$k $row")
      }
    }
  }
}
