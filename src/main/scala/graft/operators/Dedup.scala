package graft.operators

import graft.functions.{SketchExpressions, TextFunctions, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document corpora (north-star
  * extension, BASELINE.json). Every variant is a declarative DataFrame plan:
  *  - exact: one hash-groupBy shuffle, map-side combinable.
  *  - MinHash+LSH: shingle → signature → band-bucket join. The join key is
  *    (band, bucket), so a 100 TB self-join becomes many small per-bucket
  *    joins instead of a cross join; skewed buckets (boilerplate docs) are
  *    handled by AQE skew-join splitting.
  *  - SimHash: 64-bit fingerprint + bucket-by-prefix for near-dup blocking.
  *  - n-gram Jaccard: exact verification on LSH candidates only.
  */
object Dedup {

  /** Exact dedup: group rows by content hash, keep the smallest id per
    * cluster. Returns (text_hash, keep_doc_id, n_copies).
    */
  def exactClusters(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Rows surviving exact dedup (the keeper of each cluster). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactClusters(docs, idCol, textCol)
      .select(col("keep_doc_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash signatures: (doc_id, sig array<bigint>). Docs shorter than the
    * shingle size produce no signature and are dropped from near-dup search.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, numHashes: Int): DataFrame = {
    // Shingling + hashing is the CPU-heavy stage; a single small parquet file
    // arrives as one partition, so spread it across the cores first — but
    // ONLY then: at real scale the scan already has >= parallelism splits and
    // an unconditional repartition would shuffle the full text corpus for
    // nothing.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    spread
      .select(
        col(idCol).as("doc_id"),
        SketchExpressions.minhash(
          TextFunctions.wordShingles(col(textCol), shingleK), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** LSH candidate pairs with estimated Jaccard = fraction of equal minhash
    * components. Returns (doc_a, doc_b, est_jaccard), doc_a < doc_b, distinct.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // Signatures feed the band explode AND the per-pair estimate; persist so
    // the expensive shingle+hash stage runs a single time. DISK_ONLY, not an
    // eager localCheckpoint: at 100 TB the signature table exceeds cluster
    // storage memory, and a truncated-lineage checkpoint that gets evicted
    // cannot be recomputed — disk persistence keeps both the memory profile
    // flat and the lineage intact. Lifetime contract: the persist lives
    // inside the lazily-returned plan, so it cannot be released here — the
    // caller that runs the action owns it and releases it afterwards via
    // [[graft.Storage.releaseAll]] (Verify/Bench do this per query).
    val sig = minhashSignatures(docs, idCol, textCol, shingleK, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // Candidate pairs travel without signature payload: dedupe (doc_a, doc_b)
    // across bands first, then re-attach the two signatures. Keeps the
    // band-bucket shuffle narrow and computes each pair's estimate once.
    val banded = sig.select(col("doc_id"),
      posexplode(TextFunctions.lshBands(col("sig"), bands, rows)).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val est = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x
    ).cast("double") / lit(numHashes)
    pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), round(est, 4).as("est_jaccard"))
  }

  /** MinHash signatures in the SQL-portable 60-bit hash family
    * ([[graft.functions.PortableHash]]) — same signature/banding semantics
    * as [[minhashSignatures]], different hash. Shape: explode shingles →
    * one codegen'd md5 per shingle → k permuted mins via groupBy — every
    * stage is whole-stage-codegen'd and the min aggregation map-side
    * combines, so this formulation ALSO scales (the xxhash64 native
    * expression remains the cheaper production default).
    */
  def minhashSignaturesPortable(docs: DataFrame, idCol: String, textCol: String,
                                shingleK: Int, numHashes: Int,
                                seed: Long = 42L): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    // One native pass per document (PortableMinHashExpr): the relational
    // explode → hash → groupBy-min formulation below is kept as the parity
    // reference — it amplifies the corpus by shingles-per-document and
    // pays a shuffle to re-group row-local data (the shape the DuckDB
    // oracle still replays).
    //
    // The too-short-document filter runs BELOW the projection on the cheap
    // tokenizer, not above it as `sig.isNotNull`: predicate pushdown
    // inlines a filtered alias's whole expression tree into the Filter
    // node, and an isNotNull over the sig alias re-evaluates every md5
    // per row (seen in the plan: `Condition: isnotnull(minhash60(...))`
    // beneath the Project computing the same). Token count ≥ k is
    // equivalent — wordShingles is empty exactly below k tokens, and
    // shingle elements are never null — so sig is provably non-null for
    // every surviving row.
    spread
      .filter(size(graft.functions.SketchExpressions.whitespaceTokens(
        col(textCol))) >= shingleK)
      .select(col(idCol).as("doc_id"),
        graft.functions.SketchExpressions.minhashPortable(
          TextFunctions.wordShingles(col(textCol), shingleK), numHashes, seed)
          .as("sig"))
  }

  /** The relational formulation of [[minhashSignaturesPortable]] — explode
    * shingles, hash, groupBy k mins — kept as the bit-for-bit parity
    * reference for the native expression (pinned in OperatorsSpec) and as
    * the literal shape of the oracle's SQL replay.
    */
  def minhashSignaturesPortableRelational(docs: DataFrame, idCol: String,
                                          textCol: String, shingleK: Int,
                                          numHashes: Int,
                                          seed: Long = 42L): DataFrame = {
    import graft.functions.PortableHash
    val consts = PortableHash.permConstants(numHashes, seed)
    val hashed = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordShingles(col(textCol), shingleK)).as("g"))
      .select(col("doc_id"), PortableHash.hash60(col("g")).as("h"))
    val mins = consts.zipWithIndex.map { case ((r, c), j) =>
      min(PortableHash.permute(col("h"), r, c)).as(s"__m$j")
    }
    hashed.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(j => col(s"__m$j")): _*).as("sig"))
  }

  /** LSH candidate pairs over the portable hash family; band buckets join on
    * the signature SLICE itself (no extra bucket hash — array equality is the
    * key), so the SQL oracle can reproduce the join exactly.
    * Returns (doc_a, doc_b, est_jaccard), doc_a < doc_b, distinct.
    */
  def minhashCandidatesPortable(docs: DataFrame, idCol: String, textCol: String,
                                shingleK: Int = 3, numHashes: Int = 16,
                                bands: Int = 4, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignaturesPortable(docs, idCol, textCol, shingleK, numHashes, seed)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * lit(rows) + lit(1), lit(rows)))).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val est = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x
    ).cast("double") / lit(numHashes)
    pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), round(est, 4).as("est_jaccard"))
  }

  /** 60-bit SimHash in the portable hash family — one native pass per
    * document ([[graft.functions.SketchExpressions.simhashPortable]]):
    * one md5 per token, majority vote per bit, tokenless documents 0.
    * Returns (doc_id, simhash). The relational formulation below is the
    * parity reference and the shape the oracle replays.
    */
  def simhash60Portable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.SketchExpressions.simhashPortable(
        TextFunctions.tokens(col(textCol))).as("simhash"))

  /** The relational formulation of [[simhash60Portable]]: explode tokens,
    * one md5 per token, 60 bit-count sums via groupBy (map-side
    * combinable), pack the majority votes, left-join tokenless documents
    * back as 0. Kept as the bit-for-bit parity reference for the native
    * expression (pinned in OperatorsSpec) and the literal shape of the
    * oracle's SQL replay.
    */
  def simhash60PortableRelational(docs: DataFrame, idCol: String,
                                  textCol: String): DataFrame = {
    import graft.functions.PortableHash
    val hashed = docs
      .select(col(idCol).as("doc_id"), explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(col("doc_id"), PortableHash.hash60(col("t")).as("h"))
    val bitSums = (0 until 60).map(bit =>
      sum(shiftright(col("h"), bit).bitwiseAND(lit(1L))).as(s"__b$bit"))
    val votes = hashed.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__n"), bitSums: _*)
    val packed = (0 until 60).map(bit =>
      when(col(s"__b$bit") * 2 > col("__n"), lit(1L << bit)).otherwise(lit(0L)))
      .reduce(_ + _)
    val simed = votes.select(col("doc_id"), packed.as("simhash"))
    docs.select(col(idCol).as("doc_id"))
      .join(simed, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** Exact word-shingle Jaccard for a pair frame (doc_a, doc_b) — the
    * verification stage run only on LSH candidates, never on the full cross
    * product. Two broadcast-eligible joins re-attach shingle sets.
    */
  def verifyJaccard(candidates: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, shingleK: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), shingleK)).as("__sh"))
    val withA = candidates
      .join(sh.select(col("__id").as("doc_a"), col("__sh").as("sh_a")), Seq("doc_a"))
    val both = withA
      .join(sh.select(col("__id").as("doc_b"), col("__sh").as("sh_b")), Seq("doc_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val uni = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    both.select(col("doc_a"), col("doc_b"),
      round(when(uni === 0d, lit(null)).otherwise(inter / uni), 4).as("jaccard"))
  }

  /** Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold. */
  def nearDups(docs: DataFrame, idCol: String, textCol: String,
               threshold: Double = 0.5, shingleK: Int = 3,
               numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val cand = minhashCandidates(docs, idCol, textCol, shingleK, numHashes, bands)
    verifyJaccard(cand, docs, idCol, textCol, shingleK)
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-dup, exact variant: all pairs above a cosine
    * threshold. One side is broadcast, so use only on a bounded candidate
    * set (a cluster, a bucket, a sample); the scale path is
    * [[embeddingNearDupsLsh]], which turns the cross join into a
    * per-bucket join via random-hyperplane blocking.
    */
  def embeddingNearDupsExact(emb: DataFrame, idCol: String, vecCol: String,
                             minCosine: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      VectorFunctions.normSq(col(vecCol)).as("na"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      VectorFunctions.normSq(col(vecCol)).as("nb"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("va"), col("vb")), col("na"), col("nb")), 6))
      .filter(col("cos_sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Embedding-cosine near-dup at scale: hyperplane-LSH buckets block the
    * pair space (equal bucket ⇒ candidate), then the exact cosine filter
    * verifies.
    *
    * Geometry must scale with the corpus: per-bucket pair cost is
    * O((n/2^nPlanes)^2), so nPlanes has to GROW with n (default 12 ⇒ 4096
    * buckets) — a small fixed bucket count quietly degenerates toward the
    * all-pairs join. More planes cut recall (a near-dup pair survives one
    * table with probability cos-angle^nPlanes), so recall is bought back
    * with `nTables` independent plane sets OR-amplified together: a pair is
    * a candidate if ANY table buckets it together. Union-distinct of
    * per-table verified pairs — each table is its own bucket equi-join, the
    * corpus is never crossed. Recall vs the exact operator is pinned in
    * OperatorsSpec.
    */
  def embeddingNearDupsLsh(emb: DataFrame, idCol: String, vecCol: String,
                           minCosine: Double, nPlanes: Int = 12, nTables: Int = 2,
                           dim: Int = 64, seed: Long = 42L): DataFrame = {
    import graft.functions.VectorFunctions
    require(nTables >= 1, "nTables must be >= 1")
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.normSq(col(vecCol)).as("nsq"))
    val perTable = (0 until nTables).map { t =>
      val planes = VectorFunctions.seededPlanes(nPlanes, dim, seed + t)
      val bucketed = base.withColumn("bucket",
        VectorFunctions.hyperplaneBucket(col("v"), planes))
      val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("va"),
        col("nsq").as("na"))
      val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"),
        col("nsq").as("nb"))
      a.join(b, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
          VectorFunctions.dot(col("va"), col("vb")), col("na"), col("nb")), 6))
        .filter(col("cos_sim") >= minCosine)
        .select(col("id_a"), col("id_b"), col("cos_sim"))
    }
    perTable.reduce(_ union _).distinct()
  }

  /** Embedding-space DECONTAMINATION — the semantic sibling of the
    * token-overlap decontaminate ([[graft.operators.Decontaminate]]):
    * flag TRAIN vectors whose cosine to ANY TEST vector reaches
    * `minCosine` (a paraphrased benchmark item shares no 8-gram but
    * sits next to the test item in embedding space). Cross-corpus
    * [[embeddingNearDupsLsh]]: the SAME seeded hyperplane sets bucket
    * both corpora, each OR-amplified table equi-joins train×test
    * buckets only (never train×train — the corpus is never crossed
    * with itself), and the exact cosine verifies. At 100 TB the train
    * side is the big one and it is never shuffled against itself; the
    * per-table join is bucket-blocked with the test side typically
    * small enough to broadcast.
    *
    * @return (train_id, test_id, cos_sim) — distinct flagged pairs;
    *         anti-join trains against it for the clean set.
    */
  def embeddingDecontaminate(train: DataFrame, test: DataFrame,
                             idCol: String, vecCol: String,
                             minCosine: Double, nPlanes: Int = 12,
                             nTables: Int = 2, dim: Int = 64,
                             seed: Long = 42L): DataFrame = {
    import graft.functions.VectorFunctions
    require(nTables >= 1, "nTables must be >= 1")
    val tr = train.select(col(idCol).as("train_id"), col(vecCol).as("va"),
      VectorFunctions.normSq(col(vecCol)).as("na"))
    val te = test.select(col(idCol).as("test_id"), col(vecCol).as("vb"),
      VectorFunctions.normSq(col(vecCol)).as("nb"))
    val perTable = (0 until nTables).map { t =>
      val planes = VectorFunctions.seededPlanes(nPlanes, dim, seed + t)
      val a = tr.withColumn("bucket",
        VectorFunctions.hyperplaneBucket(col("va"), planes))
      val b = te.withColumn("bucket",
        VectorFunctions.hyperplaneBucket(col("vb"), planes))
      a.join(b, Seq("bucket"))
        .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
          VectorFunctions.dot(col("va"), col("vb")), col("na"), col("nb")), 6))
        .filter(col("cos_sim") >= minCosine)
        .select(col("train_id"), col("test_id"), col("cos_sim"))
    }
    perTable.reduce(_ union _).distinct()
  }

  /** SimHash near-dup blocking: fingerprint + 16-bit prefix bucket. Pairs
    * within a bucket whose Hamming distance ≤ maxHamming are near-dups.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 8): DataFrame = {
    val fp = docs.select(col(idCol).as("doc_id"),
        SketchExpressions.simhash(TextFunctions.tokens(col(textCol))).as("simhash"))
      .withColumn("bucket", shiftright(col("simhash"), 48))
    val a = fp.select(col("bucket"), col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = fp.select(col("bucket"), col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", TextFunctions.hamming64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup that bounds the
    * quadratic pair space by clustering FIRST — cosine pairs are only
    * formed within a cluster, so total pair cost is Σ n_c², not n².
    * A point is dropped when a LOWER-id point in its cluster is
    * semantically near (rounded cosine ≥ `minCosine`) — a deterministic
    * greedy keep-first rule, not a transitive closure, so the decision
    * for x depends only on x's own pairs.
    *
    * Cosine parity matches q29: the double dot product folds dimensions
    * in array order (bit-identical in DuckDB's `list_dot_product`),
    * round-6 guards the threshold decision.
    *
    * Scale shape: one equi-join on the cluster key (candidates), one
    * map-side-combined distinct of dropped ids, one left anti-style
    * mark-join back onto the points. THE CONTRACT: candidate-pair work
    * is Θ(Σ n_c²) ≈ n · avg_cluster_size, so the cluster key MUST be
    * granular in proportion to the corpus — a fixed k makes this
    * operator quadratic (n²/k) at 100 TB. Derive k from a target
    * cluster size ([[KMeans.kForTargetClusterSize]] /
    * [[KMeans.assignAuto]]; SemDeDup's published setting is k ≈
    * corpus/10⁴ for exactly this reason), which keeps the pair space
    * LINEAR in the corpus at a fixed per-point cost. When the derived k
    * itself reaches the hundreds, cluster with [[KMeans.assignTwoLevel]]
    * instead (group by its injective `cluster` label): same pair-space
    * bound at ~2√k·d per-point assignment cost instead of k·d.
    *
    * @param points frame carrying id, vector, and cluster columns
    *               (e.g. [[KMeans.assign]] joined back onto the corpus)
    * @return (idCol, clusterCol, `kept`) for EVERY input point
    */
  def semDedup(points: DataFrame, idCol: String, vecCol: String,
               clusterCol: String, minCosine: Double): DataFrame = {
    val a = points.select(col(clusterCol).as("__c"), col(idCol).as("id_a"),
      col(vecCol).as("va"), VectorFunctions.normSq(col(vecCol)).as("na"))
    val b = points.select(col(clusterCol).as("__c"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), VectorFunctions.normSq(col(vecCol)).as("nb"))
    val dropped = a.join(b, "__c")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("va"), col("vb")), col("na"), col("nb")), 6))
      .filter(col("cos_sim") >= minCosine)
      .select(col("id_b").as("__dropped_id")).distinct()
    points.join(dropped, points(idCol) === dropped("__dropped_id"), "left")
      .select(col(idCol), col(clusterCol),
        col("__dropped_id").isNull.as("kept"))
  }
}
