package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("firstOccurrencesOf keeps order and first copies, over lines and tokens") {
    // the C4 duplicate-line drop: real multi-line text through docLines
    val text = "keep me\ndup line\nkeep me\nother\ndup line\nlast"
    val lines = Seq(text).toDF("t")
      .select(TextFunctions.docLines(col("t")).as("ls"))
      .select(TextFunctions.firstOccurrencesOf(col("ls")))
      .as[Seq[String]].head()
    assert(lines == Seq("keep me", "dup line", "other", "last"))
    // degenerate shapes: all-same, all-unique, empty
    val cases = Seq(
      ("a a a a", Seq("a")),
      ("x y z", Seq("x", "y", "z")),
      ("", Seq.empty[String]))
    cases.foreach { case (in, want) =>
      val got = Seq(in).toDF("t")
        .select(TextFunctions.tokens(col("t")).as("u"))
        .select(TextFunctions.firstOccurrencesOf(col("u")))
        .as[Seq[String]].head()
      assert(got == want, in)
    }
  }

  test("firstOccurrencesOf: native pass is pinned to the built-in form, incl. nulls") {
    val cases: Seq[Seq[String]] = Seq(
      Seq("a", "b", "a", "c", "b", "a"),
      Seq("x"),
      Seq.empty[String],
      Seq("dup", "dup", "dup"),
      Seq("", "a", "", "b"),               // empty strings are real values
      Seq(null, "a", null, "a", "b"))      // nulls drop in BOTH forms
    val df = cases.toDF("ls")
    val got = df.select(
      TextFunctions.firstOccurrencesOf(col("ls")).as("native"),
      TextFunctions.firstOccurrencesOfBuiltin(col("ls")).as("builtin"))
    got.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
    // null array passes through as null in both forms
    val nr = Seq(Option.empty[Seq[String]]).toDF("ls").select(
      TextFunctions.firstOccurrencesOf(col("ls")),
      TextFunctions.firstOccurrencesOfBuiltin(col("ls"))).head()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("firstOccurrencesOf handles a pathological 50k-line document in one pass") {
    // The built-in O(n²) form would do ~1.25e9 comparisons here; the native
    // hash-set pass is linear. Verified against a driver-side reference.
    val lines = (0 until 50000).map(i => s"line${i % 1000}")
    val got = Seq(lines).toDF("ls")
      .select(TextFunctions.firstOccurrencesOf(col("ls")))
      .as[Seq[String]].head()
    assert(got == lines.distinct)
  }

  test("tokenCount / charCount / stopwordCount on hand strings") {
    val df = Seq("the cat sat on the mat", "", "  spaced   out  ").toDF("t").select(
      TextFunctions.tokenCount(col("t")).as("n"),
      TextFunctions.charCount(col("t")).as("c"),
      TextFunctions.stopwordCount(col("t")).as("s"))
    val r = df.collect()
    assert(r(0).getLong(0) == 6 && r(0).getLong(2) == 2) // 'the' twice
    assert(r(1).getLong(0) == 0)
    assert(r(2).getLong(0) == 2)
  }

  test("ratios are null on empty input, never NaN (§1.4)") {
    val r = Seq("").toDF("t")
      .select(TextFunctions.stopwordRatio(col("t")).as("r")).collect()
    assert(r(0).isNullAt(0))
  }

  test("langId picks the dominant marker language, 'und' when none") {
    val df = Seq(
      "the cat and the dog is that it",
      "der hund und die katze ist nicht ein",
      "xyzzy plugh qwerty",
    ).toDF("t").select(TextFunctions.langId(col("t")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "und"))
  }

  test("wordShingles builds k-grams; shorter docs yield empty array") {
    val r = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 3).as("s")).collect()
    assert(r(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](0).isEmpty)
  }

  test("native countMatching equals size(filter(rlike)) incl. null elements and null arrays") {
    val bullet = "^\\s*[-*•‣▪] "
    val data = Seq(
      Some(Seq(Some("- a bullet"), Some("  • indented"), Some("plain"), None)),
      Some(Seq[Option[String]]()),
      None,
      Some(Seq(Some("* star "), Some("▪ block"), Some("-nospace"), Some("…"))))
    val df = data.toDF("ls").select(
      SketchExpressions.countMatching(col("ls"), bullet).as("native"),
      size(filter(col("ls"), l => l.rlike(bullet))).as("builtin"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1), r.toString)
    }
    // the three signal wrappers produce identical fractions to the HOF form
    val lines = Seq(Seq("- x y", "word...", "plain …", "• b", "last"))
      .toDF("ls")
    val got = lines.select(
      TextFunctions.bulletLineFractionOf(col("ls")).as("b"),
      TextFunctions.ellipsisLineFractionOf(col("ls")).as("e")).collect().head
    assert(got.getDouble(0) == 2.0 / 5 && got.getDouble(1) == 2.0 / 5)
  }

  test("native whitespace tokenizer equals regexp_extract_all('\\S+') exactly") {
    val data = Seq(
      "plain words here",
      "  leading and   multiple   gaps\tand\ttabs\n",
      "",
      "   \t \r\n ",                       // whitespace-only → empty array
      "café – ﬁ 😀 ok",                 // multi-byte chars inside tokens
      "nbsp is-not-a-separator",      // U+00A0 is NOT \s in Java regex
      "\u000Bvertical\u000Ctab\rcr")
    val df = (data.map(Option(_)) :+ None).toDF("s").select(
      TextFunctions.tokens(col("s")).as("native"),
      TextFunctions.tokensBuiltin(col("s")).as("builtin"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
  }

  test("native line splitter equals filter(split('\\n'), nonempty) exactly") {
    val data = Seq(
      "one line",
      "a\nb\nc",
      "a\n\n\nb",            // empty segments drop in both forms
      "\ntrailing\n",
      "tabs\tstay put\non one line",
      "")
    val df = (data.map(Option(_)) :+ None).toDF("s").select(
      TextFunctions.docLines(col("s")).as("native"),
      TextFunctions.docLinesBuiltin(col("s")).as("builtin"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
  }

  test("native hash60 matches the built-in md5 chain bit-for-bit") {
    val df = Seq("", "a", "hello world", "café – ﬁ 😀", "x" * 3000,
        "line\nbreak\ttab")
      .toDF("s").select(
        PortableHash.hash60(col("s")).as("native"),
        PortableHash.hash60Builtin(col("s")).as("builtin"))
    df.collect().foreach { r =>
      assert(!r.isNullAt(0) && r.getLong(0) == r.getLong(1))
      assert(r.getLong(0) >= 0 && r.getLong(0) <= PortableHash.Mask60)
    }
    val n = Seq[Option[String]](None).toDF("s")
      .select(PortableHash.hash60(col("s"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("native wordShingles matches the built-in formulation exactly") {
    val df = Seq("the quick brown fox jumps over", "a b c", "one two", "")
      .toDF("t").select(
        TextFunctions.wordShingles(col("t"), 3).as("native"),
        TextFunctions.wordShinglesBuiltin(col("t"), 3).as("builtin"))
    df.collect().foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("native ngram run fractions match the built-in folds bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("the", "cat", "sat", "mat", "dog", "ünï", "x")
    val randomDocs = (1 to 40).map(_ =>
      (1 to rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val edgeDocs = Seq("", "a", "a b", "a a a a a a", "one two three",
      "a b a b a b a b", "ünï çø∂é ünï çø∂é ünï")
    for (n <- Seq(2, 3, 5)) {
      val df = (edgeDocs ++ randomDocs).toDF("t")
        .select(TextFunctions.tokens(col("t")).as("ts"))
        .select(
          TextFunctions.topNgramFractionOf(col("ts"), n).as("top_native"),
          TextFunctions.topNgramFractionOfBuiltin(col("ts"), n).as("top_builtin"),
          TextFunctions.dupNgramFractionOf(col("ts"), n).as("dup_native"),
          TextFunctions.dupNgramFractionOfBuiltin(col("ts"), n).as("dup_builtin"))
      df.collect().foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"n=$n top null mismatch: $r")
        if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"n=$n $r")
        assert(r.isNullAt(2) == r.isNullAt(3), s"n=$n dup null mismatch: $r")
        if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3), s"n=$n $r")
      }
    }
  }

  test("native MinHash expression matches the built-in HOF formulation bit-for-bit") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "pack my box with five dozen liquor jugs of very bad quality",
      "a b", // below shingle size → null signature both ways
    ).toDF("t")
    val hof = texts.select(
      TextFunctions.minhashSignature(TextFunctions.wordShingles(col("t"), 3), 16).as("s"))
    val native = texts.select(
      SketchExpressions.minhash(TextFunctions.wordShingles(col("t"), 3), 16).as("s"))
    val (h, n) = (hof.collect(), native.collect())
    h.zip(n).foreach { case (a, b) =>
      if (a.isNullAt(0)) assert(b.isNullAt(0))
      else assert(a.getSeq[Long](0) == b.getSeq[Long](0))
    }
  }

  test("native SimHash expression matches the built-in HOF formulation bit-for-bit") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "completely different words entirely here now",
      "",
    ).toDF("t")
    val hof = texts.select(TextFunctions.simhash64(TextFunctions.tokens(col("t"))).as("s")).collect()
    val native = texts.select(SketchExpressions.simhash(TextFunctions.tokens(col("t"))).as("s")).collect()
    hof.zip(native).foreach { case (a, b) => assert(a.getLong(0) == b.getLong(0)) }
  }

  test("simhash of similar docs is closer in Hamming distance than dissimilar") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "entirely unrelated text about spark catalyst optimizer internals and shuffles"),
    ).toDF("id", "t").select(col("id"), SketchExpressions.simhash(TextFunctions.tokens(col("t"))).as("s"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
  }

  test("native dot product matches the built-in fold bit-for-bit") {
    val df = Seq(
      (Array(0.1f, -2.5f, 3.25f), Array(1.5f, 0.25f, -0.75f)),
      (Array(1e-8f, 2e8f, -3.5f), Array(7.25f, 1e-8f, 2.5f)),
    ).toDF("a", "b").select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotBuiltin(col("a"), col("b")).as("builtin"))
    df.collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vector cosine: orthogonal=0, identical=1, null-safe on zero vector") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(0f, 0f), Array(1f, 0f)),
    ).toDF("a", "b").select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    val r = df.collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r(1).getDouble(0)) < 1e-12)
    assert(r(2).isNullAt(0))
  }

  test("redactPii masks emails, phones, and IPs; clean text passes through") {
    val df = Seq(
      "mail me at jane_doe+test@sub.example.co.uk please",
      "call +44 (20) 7946-0958 now",
      "server at 10.0.255.7 is up",
      "perfectly ordinary sentence",
    ).toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
    val r = df.as[String].collect()
    assert(r(0) == "mail me at <EMAIL> please")
    assert(r(1) == "call <PHONE> now")
    assert(r(2) == "server at <IP> is up")
    assert(r(3) == "perfectly ordinary sentence")
  }

  test("redactPii leaves dates and bare numeric IDs alone but still catches phones") {
    val df = Seq(
      "released on 2026-08-12 and again on 1999-01-31",   // ISO dates: hyphens only
      "order 12345678901 shipped, invoice 987654321",     // bare IDs: no separators
      "ring 020 7946 0958 today",                         // domestic spaced phone
      "freephone 0800 123456 anytime",                    // 4-digit prefix + space
      "dial (020) 7946 0958 or +12025550173",             // paren + E.164 forms
    ).toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
    val r = df.as[String].collect()
    assert(r(0) == "released on 2026-08-12 and again on 1999-01-31")
    assert(r(1) == "order 12345678901 shipped, invoice 987654321")
    assert(r(2) == "ring <PHONE> today")
    assert(r(3) == "freephone <PHONE> anytime")
    assert(r(4) == "dial <PHONE> or <PHONE>")
  }

  test("redactPii catches hyphen-only phones without eating dates or datetimes") {
    val df = Seq(
      "call 020-7946-0958 now",                 // hyphen-only domestic phone
      "US office: 123-456-7890",                // NANP hyphenated form
      "backup line 0161-496-0753-22 ext",       // trailing extension group
      "meeting 2026-08-12 08:30 room 4",        // ISO datetime must survive
      "window 2025-12-01-2026-01-31 inclusive", // date-range: 2-digit groups
    ).toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
    val r = df.as[String].collect()
    assert(r(0) == "call <PHONE> now")
    assert(r(1) == "US office: <PHONE>")
    assert(r(2) == "backup line <PHONE> ext")
    assert(r(3) == "meeting 2026-08-12 08:30 room 4")
    assert(r(4) == "window 2025-12-01-2026-01-31 inclusive")
  }

  test("fiscal calendar: April starts Q1/FY; March ends Q4 of prior FY") {
    val df = Seq("2019-04-01", "2019-07-15", "2020-01-10", "2020-03-31")
      .toDF("d").select(
        to_date(col("d")).as("d")).select(
        DateOps.fiscalQuarter(col("d")).as("q"),
        DateOps.fiscalStartYear(col("d")).as("fy"),
        DateOps.fiscalYearLabel(col("d")).as("label"))
    val r = df.collect()
    assert(r.map(_.getString(0)).toSeq == Seq("Q1", "Q2", "Q4", "Q4"))
    assert(r.map(_.getLong(1)).toSeq == Seq(2019L, 2019L, 2019L, 2019L))
    assert(r(0).getString(2) == "FY2019-20")
  }

  test("fiscal label split: 2019-20 and century wrap 1999-00") {
    val df = Seq("2019-20", "1999-00").toDF("s").select(
      DateOps.fiscalLabelStartYear(col("s")).as("a"),
      DateOps.fiscalLabelEndYear(col("s")).as("b"))
    val r = df.collect()
    assert((r(0).getLong(0), r(0).getLong(1)) == (2019L, 2020L))
    assert((r(1).getLong(0), r(1).getLong(1)) == (1999L, 2000L))
  }
}
