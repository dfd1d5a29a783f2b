package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InvertedIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (10L, "apple banana apple"),      // duplicate within a doc counts once
    (20L, "banana cherry"),
    (30L, "apple banana banana"),
    (40L, ""),                        // token-less doc contributes nothing
  ).toDF("doc_id", "text")

  test("df counts documents (not occurrences) and postings are sorted") {
    val got = InvertedIndex.postings(docs, "doc_id", "text", maxPostings = 10)
      .select(col("token"), col("df"), col("postings"))
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "apple"  -> (2L, Seq(10L, 30L)),
      "banana" -> (3L, Seq(10L, 20L, 30L)),
      "cherry" -> (1L, Seq(20L))))
  }

  test("maxPostings caps the list but df stays the full document count") {
    val many = (1L to 50L).map(i => (i, "common tok" + i)).toDF("doc_id", "text")
    val got = InvertedIndex.postings(many, "doc_id", "text", maxPostings = 5)
      .filter(col("token") === "common")
      .select(col("df"), col("postings")).as[(Long, Seq[Long])].collect()
    assert(got.toSeq == Seq((50L, Seq(1L, 2L, 3L, 4L, 5L))))
  }

  test("phraseMatches counts overlapping starts; scan and indexed forms agree") {
    val corpus = Seq(
      (1L, "the merge stream runs a merge stream here"), // 2 matches
      (2L, "merge alone then stream apart"),             // terms, no phrase
      (3L, "a a a a"),                                   // repeated-term case
      (4L, "merge stream"),                              // exact doc
      (5L, ""),                                          // empty
      (6L, "prefix merge stream suffix merge")).toDF("doc_id", "text")
    val scan = InvertedIndex.phraseMatches(corpus, "doc_id", "text",
      Seq("merge", "stream")).as[(Long, Long)].collect().toMap
    assert(scan == Map(1L -> 2L, 4L -> 1L, 6L -> 1L))
    val indexed = InvertedIndex.phraseSearchIndexed(corpus, "doc_id", "text",
      Seq("merge", "stream")).as[(Long, Long)].collect().toMap
    assert(indexed == scan)
    // repeated-term phrase: "a a" in "a a a a" has 3 overlapping starts
    val rep = InvertedIndex.phraseMatches(corpus, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(rep == Map(3L -> 3L))
    assert(InvertedIndex.phraseSearchIndexed(corpus, "doc_id", "text",
      Seq("a", "a")).as[(Long, Long)].collect().toMap == rep)
    // single-term phrase degenerates to occurrence counting
    val single = InvertedIndex.phraseMatches(corpus, "doc_id", "text", Seq("merge"))
      .as[(Long, Long)].collect().toMap
    assert(single == Map(1L -> 2L, 2L -> 1L, 4L -> 1L, 6L -> 2L))
  }

  test("stored-index search agrees with the scan form and plans no Exchange") {
    val corpus = Seq(
      (1L, "the merge stream runs a merge stream here"),
      (2L, "merge alone then stream apart"),
      (3L, "a a a a"),
      (4L, "merge stream"),
      (5L, ""),
      (6L, "prefix merge stream suffix merge")).toDF("doc_id", "text")
    dropTable("graft_phrase_store_spec")
    InvertedIndex.buildPhraseStore(corpus, "doc_id", "text",
      "graft_phrase_store_spec", buckets = 2)
    val stored = InvertedIndex.phraseSearchStored(spark,
      "graft_phrase_store_spec", Seq("merge", "stream"))
    assert(stored.as[(Long, Long)].collect().toMap == Map(1L -> 2L, 4L -> 1L, 6L -> 1L))
    val plan = stored.queryExecution.executedPlan.toString
    // no SHUFFLE exchange anywhere: joins either broadcast a tiny side or
    // reuse the doc_id bucketing, and the count aggregates in place.
    assert(!plan.contains("Exchange hashpartitioning"),
      "doc_id bucketing must co-locate the whole chain:\n" + plan)
    // repeated-term phrase over the store too
    assert(InvertedIndex.phraseSearchStored(spark, "graft_phrase_store_spec",
      Seq("a", "a")).as[(Long, Long)].collect().toMap == Map(3L -> 3L))
    dropTable("graft_phrase_store_spec")
  }

  test("phrase store builds at an explicit external path, rebuilds over stale data, stays exchange-free") {
    val corpus = Seq(
      (1L, "the merge stream runs a merge stream here"),
      (2L, "merge alone then stream apart"),
      (4L, "merge stream")).toDF("doc_id", "text")
    // non-warehouse location — the object-store deployment shape (catalog
    // metadata only; data wherever `path` points)
    val ext = java.nio.file.Files.createTempDirectory("graft_phrase_ext").toFile
    val extPath = new java.io.File(ext, "store").getAbsolutePath
    try {
      dropTable("graft_phrase_ext_spec")
      InvertedIndex.buildPhraseStore(corpus, "doc_id", "text",
        "graft_phrase_ext_spec", buckets = 2, path = Some(extPath))
      val stored = InvertedIndex.phraseSearchStored(spark,
        "graft_phrase_ext_spec", Seq("merge", "stream"))
      assert(stored.as[(Long, Long)].collect().toMap == Map(1L -> 2L, 4L -> 1L))
      // bucket metadata must survive the external path: the whole chain
      // still co-locates on the doc_id bucketing
      assert(!stored.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      // REBUILD over the same path: external data outlives DROP by design,
      // so the build must clear the stale location itself (via Hadoop FS,
      // not java.io.File — the scheme-agnostic contract)
      spark.sql("DROP TABLE graft_phrase_ext_spec")
      assert(new java.io.File(extPath).exists(), "external data must survive DROP")
      InvertedIndex.buildPhraseStore(corpus.filter(col("doc_id") =!= 2L),
        "doc_id", "text", "graft_phrase_ext_spec", buckets = 2, path = Some(extPath))
      assert(InvertedIndex.phraseSearchStored(spark, "graft_phrase_ext_spec",
        Seq("merge", "stream")).as[(Long, Long)].collect().toMap
        == Map(1L -> 2L, 4L -> 1L))
      spark.sql("DROP TABLE IF EXISTS graft_phrase_ext_spec")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(ext)
    }
  }

  test("phrase store rebuild clears an orphaned warehouse directory the catalog forgot") {
    val corpus = Seq((1L, "merge stream")).toDF("doc_id", "text")
    dropTable("graft_phrase_orphan_spec")
    // simulate a previous session's surviving managed directory with no
    // catalog entry (in-memory catalog + durable warehouse)
    val db = new java.net.URI(spark.catalog.getDatabase("default").locationUri)
    val orphan = new java.io.File(
      if (db.getScheme == null) new java.io.File(db.getPath)
      else new java.io.File(db), "graft_phrase_orphan_spec")
    orphan.mkdirs()
    val stale = new java.io.File(orphan, "stale.parquet")
    java.nio.file.Files.write(stale.toPath, Array[Byte](1, 2, 3))
    InvertedIndex.buildPhraseStore(corpus, "doc_id", "text",
      "graft_phrase_orphan_spec", buckets = 2)
    assert(!stale.exists(), "the stale file must be cleaned before the write")
    assert(InvertedIndex.phraseSearchStored(spark, "graft_phrase_orphan_spec",
      Seq("merge", "stream")).as[(Long, Long)].collect().toMap == Map(1L -> 1L))
    dropTable("graft_phrase_orphan_spec")
  }

  test("phraseMatches plans a single scan: no Exchange, no Generate, no join") {
    val big = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        concat(lit("tok"), col("id").cast("string"), lit(" merge stream")).as("text"))
    val plan = InvertedIndex.phraseMatches(big, "doc_id", "text",
      Seq("merge", "stream")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("proximityMatches: unordered NEAR/w pairs, closest gap, window boundary") {
    val corpus = Seq(
      (1L, "merge x join"),            // gap 2, in-window at win=2
      (2L, "join a b c merge"),        // gap 4: order-free, out at win=2
      (3L, "merge join merge"),        // two pairs at gap 1, one at... (pos0,1),(2,1)
      (4L, "merge only here"),         // one term only
      (5L, "x merge y y y join z"),    // gap 4 exactly
      (6L, "")).toDF("doc_id", "text")
    def run(win: Int) = InvertedIndex.proximityMatches(
        corpus, "doc_id", "text", "merge", "join", win)
      .as[(Long, Long, Long)].collect().toSet
    assert(run(2) == Set((1L, 1L, 2L), (3L, 2L, 1L)))
    // win=4 admits the boundary gap exactly (<=, not <)
    assert(run(4) == Set((1L, 1L, 2L), (2L, 1L, 4L), (3L, 2L, 1L),
      (5L, 1L, 4L)))
    // the stored form over the q104 layout serves the identical answer
    dropTable("graft_prox_store_spec")
    InvertedIndex.buildPhraseStore(corpus, "doc_id", "text",
      "graft_prox_store_spec", buckets = 2)
    val stored = InvertedIndex.proximitySearchStored(spark,
        "graft_prox_store_spec", "merge", "join", 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored == run(4))
    dropTable("graft_prox_store_spec")
  }

  test("the posting cap trims BEFORE the shuffle (partial WindowGroupLimit)") {
    val plan = InvertedIndex.postings(docs, "doc_id", "text", 10)
      .queryExecution.executedPlan.toString
    // The row_number ≤ cap filter compiles to a map-side WindowGroupLimit:
    // a stop-word's postings never flood the exchange or the list buffer.
    val partialLimit = plan.indexOf("WindowGroupLimit")
    assert(partialLimit >= 0 && plan.contains("Partial"), plan)
    val exchange = plan.indexOf("Exchange hashpartitioning")
    assert(plan.lastIndexOf("WindowGroupLimit") > exchange,
      s"expected a WindowGroupLimit below the exchange:\n$plan")
  }
}
