package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing invariants: matches a driver-side replay (same portable
  * hash, same rightmost-min rule), guarantees a shared fingerprint for
  * any >= w+k-1 token match, samples locally (every window covered),
  * and excludes short documents. The independent end-to-end check is
  * the q170 oracle.
  */
class WinnowingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val k = 3
  private val w = 4

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString.take(15), 16)

  private def refFingerprints(toks: Seq[String]): Set[(Long, Long)] = {
    if (toks.size < k + w - 1) return Set.empty
    val hs = toks.sliding(k).map(g => hash60(g.mkString(" "))).toVector
    (0 to hs.size - w).map { s =>
      // rightmost minimum of hs[s..s+w-1]
      val win = (s until s + w).map(j => (hs(j), j))
      val m = win.map(_._1).min
      val pos = win.filter(_._1 == m).map(_._2).max
      (pos.toLong, hs(pos))
    }.toSet
  }

  private def run(docs: Seq[(Long, Seq[String])]): Map[Long, Set[(Long, Long)]] =
    Winnowing.fingerprints(docs.toDF("doc_id", "toks"), "doc_id", "toks", k, w)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap

  test("matches the driver-side replay, including hash ties to the rightmost") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again".split(" ").toSeq,
      2L -> Seq.fill(12)("same"), // all grams identical: ties everywhere
      3L -> "a b c d e f".split(" ").toSeq)
    val got = run(docs)
    for ((id, toks) <- docs) {
      val ref = refFingerprints(toks)
      assert(got.getOrElse(id, Set.empty) == ref, s"doc $id")
    }
    // the all-ties doc resolves: rightmost min per window, deduped
    assert(got(2L).nonEmpty)
  }

  test("spark-side hash equals the portable hash60 (replay precondition)") {
    val viaSpark = Seq(Tuple1("x y z")).toDF("s")
      .select(PortableHash.hash60(col("s"))).as[Long].head()
    assert(viaSpark == hash60("x y z"))
  }

  test("a shared run of >= w+k-1 tokens yields a shared fingerprint") {
    val core = "alpha beta gamma delta epsilon zeta".split(" ").toSeq // w+k-1 = 6
    val d1 = Seq("xx", "yy") ++ core ++ Seq("zz")
    val d2 = Seq("qq") ++ core ++ Seq("rr", "ss", "tt")
    val got = run(Seq(10L -> d1, 20L -> d2))
    val shared = got(10L).map(_._2).intersect(got(20L).map(_._2))
    assert(shared.nonEmpty, s"no shared fingerprint: ${got(10L)} vs ${got(20L)}")
  }

  test("native O(n) selection is bit-identical to the pinned HOF form") {
    // Deterministic corpus with long docs, heavy tie structure (small
    // vocab forces repeated grams → repeated hashes) and boundary sizes.
    val rng = new scala.util.Random(1207L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (1L to 60L).map { id =>
      val n = (id % 7) match {
        case 0 => k + w - 1            // exactly one window
        case 1 => k + w - 2            // one short of a window: excluded
        case _ => 10 + rng.nextInt(90)
      }
      id -> Vector.fill(n.toInt)(vocab(rng.nextInt(vocab.size)))
    } :+ (999L -> Vector.fill(40)("same")) // all grams identical
    val df = docs.toDF("doc_id", "toks")
    val native = Winnowing.fingerprints(df, "doc_id", "toks", k, w)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val hof = Winnowing.fingerprintsHof(df, "doc_id", "toks", k, w)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(native == hof)
    assert(native.nonEmpty)
  }

  test("char-gram variant: shared substring across different tokenizations") {
    val ck = 8; val cw = 6
    val core = "the quick brown fox jumps over the lazy dog near the river bank"
    // Same characters, tokenized differently upstream — the raw strings
    // share the full core substring.
    val d1 = "PREFIX one two " + core + " SUFFIX"
    val d2 = core + " entirely different tail words here"
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val fps = Winnowing.fingerprintsChars(df, "doc_id", "text", ck, cw)
      .as[(Long, Long, Long)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "shared >= w+k-1 char substring must share a selected fingerprint")
    // Short strings are excluded, and the plan stays shuffle-free.
    val short = Seq((3L, "tiny")).toDF("doc_id", "text")
    assert(Winnowing.fingerprintsChars(short, "doc_id", "text", ck, cw).isEmpty)
    val p = Winnowing.fingerprintsChars(df, "doc_id", "text", ck, cw)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("short documents are excluded; the plan never shuffles") {
    val docs = Seq(1L -> Seq("a", "b", "c", "d", "e"), // 5 < k+w-1 = 6
      2L -> Seq("a", "b")).toDF("doc_id", "toks")
    assert(Winnowing.fingerprints(docs, "doc_id", "toks", k, w).isEmpty)
    val p = Winnowing.fingerprints(docs, "doc_id", "toks", k, w)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("matchesStored drops stop-fingerprints above the cap before pairing") {
    val t = "graft_test_winnow_cap"
    dropTable(t)
    val boiler = "this exact boilerplate header line appears everywhere"
    // 6 docs share the boilerplate (over a cap of 5); docs 1 and 2 also
    // share a DISTINCTIVE sentence that must survive the cap
    val real = "a genuinely distinctive shared passage of original text"
    val docs = (1L to 6L).map { id =>
      // fillers embed the id in every 4-char token, so every 8-char gram
      // of a filler (and of its boundary) is unique to its document
      val tail = if (id <= 2) real
        else s"zz${id}a zz${id}b zz${id}c zz${id}d zz${id}e zz${id}f"
      id -> s"$boiler $tail"
    }
    Winnowing.buildStore(docs.toDF("doc_id", "text"), "doc_id", "text",
      t, buckets = 2)
    val capped = Winnowing.matchesStored(spark, t, minShared = 2L,
        maxDocsPerFp = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Winnowing.matchesStored(spark, t, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size > capped.size,
      s"the cap must bite on the boilerplate: $uncapped vs $capped")
    assert(capped == Set((1L, 2L)),
      s"only the distinctive passage survives the cap: $capped")
    dropTable(t)
    graft.Storage.releaseAll(spark)
  }
}
