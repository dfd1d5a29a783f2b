package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while the rain " +
    "falls softly on the quiet village roofs and the river runs east"

  private def docs = Seq(
    (0L, base),
    (1L, base),                                  // exact dup of 0
    (2L, base.replace("rain", "snow")),          // near dup of 0
    (3L, "completely different content about query optimizers and shuffle " +
      "partitions in distributed execution engines with columnar storage"),
    (4L, "short doc"),
  ).toDF("doc_id", "text")

  test("exactDedup keeps exactly one doc per identical text") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L, 4L))
  }

  test("exactClusters reports cluster sizes") {
    val m = Dedup.exactClusters(docs, "doc_id", "text").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(m(0L) == 2 && m(2L) == 1)
  }

  test("minhashCandidates: identical docs estimate jaccard 1.0; near dups surface") {
    // r=2 per band: P(candidate) ≈ 1-(1-J²)^8 ≈ 0.999 for the J≈0.76 planted
    // near-dup — the default r=4 profile targets higher-J dedup corpora
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text", numHashes = 16, bands = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("est_jaccard")).toMap
    assert(cand((0L, 1L)) == 1.0)
    assert(cand.contains((0L, 2L)) || cand.contains((1L, 2L)), s"near-dup pair missing: $cand")
  }

  test("native portable MinHash signatures equal the relational explode/groupBy form bit-for-bit") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different text with other words entirely here now"),
      (4L, "too short"),        // below shingle k: absent from BOTH forms
      (5L, ""),
    ).toDF("doc_id", "text")
    val native = Dedup.minhashSignaturesPortable(docs, "doc_id", "text",
        shingleK = 3, numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val relational = Dedup.minhashSignaturesPortableRelational(docs, "doc_id", "text",
        shingleK = 3, numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == Set(1L, 2L, 3L) && native == relational)
  }

  test("native portable SimHash equals the relational bit-vote form bit-for-bit") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words"),
      (4L, ""),                     // tokenless → 0 in both forms
      (5L, "one"),
    ).toDF("doc_id", "text")
    val native = Dedup.simhash60Portable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val relational = Dedup.simhash60PortableRelational(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == relational)
    assert(native(4L) == 0L)
  }

  test("nearDups end-to-end: verified jaccard filters true near-dups only") {
    val nd = Dedup.nearDups(docs, "doc_id", "text", threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(nd.contains((0L, 1L)))
    assert(!nd.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhashNearDups blocks by prefix and thresholds on hamming distance") {
    val nd = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(nd.contains((0L, 1L)), s"identical docs must collide: $nd")
  }

  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f)),
    (2L, Array(0f, 1f, 0f)),
    (3L, Array(-1f, 0f, 0f)),
    (4L, Array(0.8f, 0.2f, 0.1f)),
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine similarity") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 4L))
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L))
  }

  test("ivfTopK cosines agree with brute force on every returned pair") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 4).collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 4, nlist = 3, nprobe = 3).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      assert(math.abs(brute(r.getAs[Long]("cand_id")) - r.getAs[Double]("cos_sim")) < 1e-9)
    }
  }

  test("lshTopK returns a subset consistent with brute force on its bucket hits") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 4).collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 4, nPlanes = 4, probeBits = 2, dim = 3).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val (cand, cos) = (r.getLong(1), r.getDouble(2))
      assert(math.abs(brute(cand) - cos) < 1e-9, "LSH cosine must equal brute-force cosine")
    }
  }
}
