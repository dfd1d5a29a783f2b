package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall pins for the approximate (blocked) similarity operators against
  * their exact counterparts — the check that the LSH/IVF geometries actually
  * FIND what they claim to at their default parameters, not just run.
  */
class RecallSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def realEmb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("ivfTopK with Lloyd refinement recalls most exact top-10 neighbors") {
    val queries = realEmb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(realEmb, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(realEmb, queries, "vec_id", "embedding",
        k = 10, nlist = 16, nprobe = 4, lloydRounds = 2)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF recall@10 (nlist=16, nprobe=4, lloyd=2): $recall%.3f")
    assert(recall >= 0.55, f"IVF recall collapsed: $recall%.3f")
  }

  test("ivfTopK broadcast-centroid path returns exactly the literal path's rows") {
    val queries = realEmb.filter(col("vec_id") < 10)
    def run(maxLit: Int) = Similarity.ivfTopK(realEmb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4, literalCentroidMax = maxLit)
      .select("query_id", "cand_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(run(64) == run(0)) // 0 forces every centroid through the broadcast array
  }

  // Planted near-dups: the shipped corpus has no pair above cosine 0.48, so
  // blocking recall is measured on bases + jittered copies (cos ~ 0.99).
  private def planted = {
    val rnd = new scala.util.Random(7L)
    val dim = 64
    val bases = Seq.fill(120)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = bases.zipWithIndex.flatMap { case (v, i) =>
      val dup = v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      Seq((i.toLong, v), (i.toLong + 1000L, dup))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("embeddingNearDupsLsh OR-amplified defaults recall planted near-dups") {
    val emb = planted
    val exact = Dedup.embeddingNearDupsExact(emb, "vec_id", "embedding", minCosine = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 100, s"planting failed: only ${exact.size} exact pairs")
    val lsh = Dedup.embeddingNearDupsLsh(emb, "vec_id", "embedding", minCosine = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    info(f"embedding-LSH recall (nPlanes=12, nTables=2, cos>=0.9): $recall%.3f")
    assert(recall >= 0.9, f"LSH recall collapsed: $recall%.3f") // measured 0.983
    assert(lsh.subsetOf(exact), "LSH must never emit a pair the exact filter rejects")
  }

  test("embeddingDecontaminate flags planted train-test paraphrases, never train-train") {
    // train = bases, test = jittered copies of the first 40 bases
    val emb = planted
    val train = emb.filter(col("vec_id") < 1000L)
    val test = emb.filter(col("vec_id") >= 1000L && col("vec_id") < 1040L)
    val got = Dedup.embeddingDecontaminate(train, test, "vec_id", "embedding",
        minCosine = 0.9)
      .select("train_id", "test_id").as[(Long, Long)].collect().toSet
    // exact cross reference
    val allPairs: Set[(Long, Long)] = Dedup.embeddingNearDupsExact(
        train.unionByName(test), "vec_id", "embedding", minCosine = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = allPairs.filter { case (a, b) => a < 1000L && b >= 1000L }
    assert(exact.size >= 30, s"planting failed: ${exact.size}")
    assert(got.subsetOf(exact), "decontam must never flag a sub-threshold pair")
    val recall = (exact & got).size.toDouble / exact.size
    info(f"decontam recall: $recall%.3f")
    assert(recall >= 0.9, f"decontam recall collapsed: $recall%.3f")
    assert(got.forall { case (a, b) => a < 1000L && b >= 1000L },
      "orientation must be (train, test); train never self-pairs")
  }

  test("recallAtK reports exact hit counts, including zero-overlap queries") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L), (2L, 24L),
      (3L, 30L), (3L, 31L), (3L, 32L), (3L, 33L), (3L, 34L))
      .toDF("query_id", "cand_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 99L), (1L, 98L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L), (2L, 24L),
      (3L, 97L), (3L, 96L), (3L, 95L), (3L, 94L), (3L, 93L))
      .toDF("query_id", "cand_id")
    val got = Similarity.recallAtK(exact, approx, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    // 3/5 = 6000 bp, 5/5 = 10000, 0/5 reports a ROW with 0 — not absence
    assert(got == Set((1L, 3L, 6000L), (2L, 5L, 10000L), (3L, 0L, 0L)))
  }

  test("more OR-amplification tables monotonically improve recall") {
    val emb = planted
    val exact = Dedup.embeddingNearDupsExact(emb, "vec_id", "embedding", minCosine = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def recallAt(tables: Int) = {
      val got = Dedup.embeddingNearDupsLsh(emb, "vec_id", "embedding",
          minCosine = 0.9, nPlanes = 12, nTables = tables)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val r1 = recallAt(1); val r4 = recallAt(4)
    info(f"recall 1 table: $r1%.3f, 4 tables: $r4%.3f")
    assert(r4 >= r1)
  }
}
