package graft

import graft.functions.{PortableHash, VectorFunctions}

/** Generates the DuckDB oracle SQL for the hash-family / vector queries
  * (q22, q23, q24, q27, q30, q32). These oracles are exact replicas of the
  * Spark plans' arithmetic: driver-side constants (permutation pairs,
  * hyperplane literals, centroid strides) are embedded as SQL literals from
  * the SAME Scala values the Spark plan uses, and every hash/rotation is
  * expressed in the shared 60-bit no-left-shift form of
  * [[graft.functions.PortableHash]], which both engines evaluate
  * identically.
  *
  * Hyperplane/centroid doubles are printed in exponent notation so DuckDB
  * parses them directly as DOUBLE (a plain decimal literal would become
  * DECIMAL and round-trip through a not-necessarily-correctly-rounded
  * cast).
  */
object OracleSqlGen {

  private def dbl(v: Double): String = {
    val s = f"$v%.17e"
    if (s == "nan" || s.contains("inf")) sys.error(s"non-finite plane literal: $v")
    s
  }

  private def planeList(p: Seq[Double]): String =
    p.map(dbl).mkString("[", ", ", "]::DOUBLE[]")

  /** Bucket of vector expression `v` (a DOUBLE[] SQL expression) against a
    * fixed plane set: packs sign bits, identical to
    * [[VectorFunctions.hyperplaneBucket]].
    */
  private def bucketSql(v: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($v, ${planeList(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // ---- q22: portable MinHash-LSH candidate pairs ----
  /** The shared MinHash-LSH CTE chain through `pairs` (and `sig`), reused
    * by q22 (pair list + signature agreement) and q98 (near-dup clusters).
    */
  private def minhashPairCtes(shingleK: Int, numHashes: Int, bands: Int,
                              seed: Long, docWhere: String = ""): String = {
    val rows = numHashes / bands
    val consts = PortableHash.permConstants(numHashes, seed)
    val mins = consts.zipWithIndex.map { case ((r, c), j) =>
      s"min(${PortableHash.permuteSql("h", r, c)}) AS m$j"
    }.mkString(",\n      ")
    val sigList = (0 until numHashes).map(j => s"m$j").mkString("[", ", ", "]")
    val shingle = (0 until shingleK).map(i => s"ws[i + $i]").mkString(" || ' ' || ")
    val where = if (docWhere.isEmpty) "" else s" WHERE $docWhere"
    s"""tok AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents$where
       |), sh AS (
       |  SELECT doc_id,
       |    unnest([$shingle FOR i IN range(1, len(ws) - ${shingleK - 2})]) AS g
       |  FROM tok WHERE len(ws) >= $shingleK
       |), hs AS (
       |  SELECT doc_id, ${PortableHash.hash60Sql("g")} AS h FROM sh
       |), sig AS (
       |  SELECT doc_id, $sigList AS sig FROM (
       |    SELECT doc_id,
       |      $mins
       |    FROM hs GROUP BY doc_id)
       |), banded AS (
       |  SELECT doc_id, b, sig[(b * $rows + 1):(b * $rows + $rows)] AS bucket
       |  FROM sig, (SELECT unnest(range(0, $bands)) AS b)
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM banded a JOIN banded b2 ON a.b = b2.b AND a.bucket = b2.bucket
       |  WHERE a.doc_id < b2.doc_id
       |)""".stripMargin
  }

  def q22Sql(shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
             seed: Long = 42L, docWhere: String = ""): String =
    s"""WITH ${minhashPairCtes(shingleK, numHashes, bands, seed, docWhere)}
       |SELECT p.doc_a, p.doc_b,
       |  round(CAST(list_sum([CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END
       |                       FOR j IN range(1, ${numHashes + 1})]) AS DOUBLE)
       |        / $numHashes.0, 4) AS est_jaccard
       |FROM pairs p
       |JOIN sig sa ON p.doc_a = sa.doc_id
       |JOIN sig sb ON p.doc_b = sb.doc_id""".stripMargin

  // ---- q98: near-dup clustering end-to-end — the q22 LSH pairs become
  // the edge list of a graph whose connected components are the dup
  // clusters; every doc labels with the MINIMUM doc_id it can reach
  // (symmetric closure via a recursive CTE — exact, engine-agnostic),
  // singletons label themselves, and the cluster minimum is the kept
  // representative.
  def q98Sql(shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
             seed: Long = 42L): String =
    s"""WITH RECURSIVE ${minhashPairCtes(shingleK, numHashes, bands, seed)}, e AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), reach AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
       |), lbl AS (
       |  SELECT a AS doc_id, least(a, min(b)) AS cluster
       |  FROM reach GROUP BY a
       |)
       |SELECT d.doc_id,
       |  COALESCE(l.cluster, d.doc_id) AS cluster,
       |  d.doc_id = COALESCE(l.cluster, d.doc_id) AS is_rep
       |FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id""".stripMargin

  // ---- q187: SQ8 — per-dimension min/max from one scan, the same
  // clamped affine code, code-domain squared L2, same tiebreak.
  def q187Sql(dim: Int = 64, queryId: Long = 0L, topK: Int = 25,
              scale: Long = 1000000L, levels: Int = 256): String =
    s"""WITH pts AS (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(x AS DOUBLE) * $scale.0) AS BIGINT)
       |     FOR x IN embedding] AS x
       |  FROM embeddings
       |), mm AS (
       |  SELECT t.dim AS dim, min(x[t.dim]) AS mn, max(x[t.dim]) AS mx
       |  FROM pts CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS dim) t
       |  GROUP BY 1
       |), codes AS (
       |  SELECT p.vec_id, m.dim,
       |    CASE WHEN m.mx = m.mn THEN 0
       |         ELSE least(greatest(
       |           ((p.x[m.dim] - m.mn) * ${levels - 1}) // (m.mx - m.mn),
       |           0), ${levels - 1}) END AS c
       |  FROM pts p CROSS JOIN mm m
       |), q AS (
       |  SELECT dim, c FROM codes WHERE vec_id = $queryId
       |), d AS (
       |  SELECT codes.vec_id,
       |         CAST(sum((codes.c - q.c) * (codes.c - q.c)) AS BIGINT) AS sq_dist
       |  FROM codes JOIN q ON q.dim = codes.dim
       |  WHERE codes.vec_id <> $queryId
       |  GROUP BY 1
       |)
       |SELECT vec_id AS cand_id, sq_dist FROM d
       |ORDER BY sq_dist, cand_id LIMIT $topK""".stripMargin

  // ---- q185: HITS unrolled — each round is two join+sum halves with a
  // max-normalizing truncating division, exactly the operator's
  // arithmetic (the q94 fixed-round discipline). Every round-chain CTE is
  // AS MATERIALIZED: e and nodes are referenced in EVERY round and a$k by
  // both hr$k and the final select — without materialization DuckDB
  // re-expands each reference's whole upstream chain, which at sf1
  // (6M-edge graph) spilled >78 GB of temp before ENOSPC (the q133
  // exponential-recompute lesson; measured twice in the r13 sf1 run).
  def q185Sql(rounds: Int = 2, scale: Long = 1000000L): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT l_partkey * 2 AS s, l_suppkey * 2 + 1 AS d
         |  FROM lineitem
         |), nodes AS MATERIALIZED (
         |  SELECT s AS node FROM e UNION SELECT d FROM e
         |), h0 AS MATERIALIZED (
         |  SELECT node, CAST($scale AS BIGINT) AS h FROM nodes
         |)""".stripMargin)
    for (k <- 1 to rounds) {
      sb.append(
        s""", ar$k AS MATERIALIZED (
           |  SELECT e.d, CAST(sum(h.h) AS BIGINT) AS ar
           |  FROM e JOIN h${k - 1} h ON h.node = e.s GROUP BY 1
           |), am$k AS MATERIALIZED (SELECT max(ar) AS m FROM ar$k),
           |a$k AS MATERIALIZED (
           |  SELECT node, CASE WHEN am$k.m > 0
           |    THEN (COALESCE(ar.ar, 0) * $scale) // am$k.m ELSE 0 END AS a
           |  FROM nodes LEFT JOIN ar$k ar ON ar.d = node CROSS JOIN am$k
           |), hr$k AS MATERIALIZED (
           |  SELECT e.s, CAST(sum(a.a) AS BIGINT) AS hr
           |  FROM e JOIN a$k a ON a.node = e.d GROUP BY 1
           |), hm$k AS MATERIALIZED (SELECT max(hr) AS m FROM hr$k),
           |h$k AS MATERIALIZED (
           |  SELECT node, CASE WHEN hm$k.m > 0
           |    THEN (COALESCE(hr.hr, 0) * $scale) // hm$k.m ELSE 0 END AS h
           |  FROM nodes LEFT JOIN hr$k hr ON hr.s = node CROSS JOIN hm$k
           |)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT h$rounds.node, h$rounds.h AS hub_q, a$rounds.a AS auth_q
         |FROM h$rounds JOIN a$rounds ON a$rounds.node = h$rounds.node""".stripMargin)
    sb.toString
  }

  // ---- q183: the q98 cluster labels + the q46 hash split applied to the
  // CLUSTER representative (all members of a near-dup family land in the
  // same split — the leakage guard).
  def q183Sql(shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
              seed: Long = 42L): String = {
    val bucket = operators.Sampling.hashBucketSql("cluster", "graft", 100)
    s"""WITH RECURSIVE ${minhashPairCtes(shingleK, numHashes, bands, seed)}, e AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), reach AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
       |), lbl AS (
       |  SELECT a AS doc_id, least(a, min(b)) AS cluster
       |  FROM reach GROUP BY a
       |), cl AS (
       |  SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id
       |)
       |SELECT doc_id, cluster,
       |  CASE WHEN $bucket < 80 THEN 'train'
       |       WHEN $bucket < 90 THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM cl""".stripMargin
  }

  // ---- q23: portable SimHash + rolling fingerprint ----
  def q23Sql(): String = {
    val bitSums = (0 until 60).map(b => s"sum((h >> $b) & 1) AS b$b").mkString(",\n      ")
    val packed = (0 until 60).map(b => s"(CASE WHEN 2 * b$b > n THEN ${1L << b} ELSE 0 END)")
      .mkString("(", "\n      + ", ")")
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
       |), th AS (
       |  SELECT doc_id, ${PortableHash.hash60Sql("t")} AS h
       |  FROM (SELECT doc_id, unnest(ws) AS t FROM tok)
       |), votes AS (
       |  SELECT doc_id, count(*) AS n,
       |      $bitSums
       |  FROM th GROUP BY doc_id
       |), sims AS (
       |  SELECT doc_id, CAST($packed AS BIGINT) AS simhash FROM votes
       |), fp AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(0::BIGINT, [${PortableHash.hash60Sql("t")} FOR t IN ws]),
       |      (acc, h) -> xor(${PortableHash.rot60Sql("acc", 7)}, h)) AS fingerprint
       |  FROM tok
       |)
       |SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash, f.fingerprint
       |FROM documents d
       |LEFT JOIN sims s ON d.doc_id = s.doc_id
       |JOIN fp f ON d.doc_id = f.doc_id""".stripMargin
  }

  // ---- q24: hyperplane-LSH top-k with multi-probe ----
  def q24Sql(k: Int = 5, nPlanes: Int = 8, probeBits: Int = 4, dim: Int = 64,
             seed: Long = 42L, nQueries: Int = 5): String = {
    val planes = VectorFunctions.seededPlanes(nPlanes, dim, seed)
    val probeXors = (0L +: (0 until probeBits).map(i => 1L << i)).mkString("[", ", ", "]")
    s"""WITH c AS (
       |  SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv,
       |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS cn,
       |    ${bucketSql("embedding::DOUBLE[]", planes)} AS bucket
       |  FROM embeddings
       |), q0 AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
       |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS qn,
       |    ${bucketSql("embedding::DOUBLE[]", planes)} AS bucket0
       |  FROM embeddings WHERE vec_id < $nQueries
       |), probes AS (
       |  SELECT DISTINCT query_id, qv, qn, xor(bucket0, p) AS bucket
       |  FROM q0, (SELECT unnest($probeXors) AS p)
       |), scored AS (
       |  SELECT DISTINCT p.query_id, c.cand_id,
       |    round(list_dot_product(p.qv, c.cv) / (sqrt(p.qn) * sqrt(c.cn)), 6) AS cos_sim
       |  FROM c JOIN probes p USING (bucket)
       |  WHERE p.query_id <> c.cand_id
       |)
       |SELECT query_id, cand_id, cos_sim, CAST(rn AS BIGINT) AS rank FROM (
       |  SELECT query_id, cand_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, cand_id) AS rn
       |  FROM scored) WHERE rn <= $k""".stripMargin
  }

  // ---- q27: REAL PNG decode metadata ----
  // The Spark side encodes a deterministic pixel grid as genuine PNG bytes
  // (javax.imageio) and decodes them back; the oracle reproduces the
  // DECODED result from the same pixel formulas
  // (graft.operators.Multimodal.widthFor/heightFor/rgbFor) — PNG bytes are
  // encoder-dependent, the decoded pixels are not. Sample order matches the
  // decoder's fold: row-major, R then G then B per pixel.
  def q27Sql(): String =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |    CAST(doc_id % 13 + 1 AS INTEGER) AS width,
       |    CAST(doc_id % 7 + 1 AS INTEGER) AS height
       |  FROM documents
       |), px AS (
       |  SELECT doc_id, width, height,
       |    [CASE i % 3
       |       WHEN 0 THEN (doc_id + 31 * ((i // 3) % width) + 17 * (i // (3 * width))) % 256
       |       WHEN 1 THEN (3 * doc_id + 7 * ((i // 3) % width) + 11 * (i // (3 * width))) % 256
       |       ELSE (5 * doc_id + 13 * ((i // 3) % width) + 3 * (i // (3 * width))) % 256
       |     END FOR i IN range(width * height * 3)] AS samples
       |  FROM dims
       |)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  width, height, CAST(3 AS INTEGER) AS channels,
       |  list_reduce(list_prepend(0::BIGINT, samples),
       |    (a, x) -> xor((a % ${1L << 55}) * 32 + (a >> 55), x)) AS checksum
       |FROM px""".stripMargin

  // ---- q55: real WAV decode metadata + PCM sample checksum ----
  // Mirrors q27Sql: the WAV generation parameters and sample formula are
  // deterministic in doc_id (Multimodal.sampleRateFor/channelsFor/
  // frameCountFor/sampleFor), so the oracle recomputes what the real
  // javax.sound decode must recover. Sample order is frame-major with
  // channel innermost — exactly the PCM byte order the decoder folds.
  def q55Sql(): String =
    s"""WITH params AS (
       |  SELECT doc_id,
       |    CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
       |    CAST(1 + doc_id % 2 AS INTEGER) AS channels,
       |    CAST(50 + doc_id % 101 AS BIGINT) AS n_frames
       |  FROM documents
       |), px AS (
       |  SELECT doc_id, sample_rate, channels, n_frames,
       |    [(doc_id * 31 + (i // channels) * 7 + (i % channels) * 13) % 65536
       |     FOR i IN range(n_frames * channels)] AS samples
       |  FROM params
       |)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  sample_rate, channels, n_frames,
       |  list_reduce(list_prepend(0::BIGINT, samples),
       |    (a, x) -> xor((a % ${1L << 55}) * 32 + (a >> 55), x)) AS checksum
       |FROM px""".stripMargin

  // ---- q58: Gopher duplicate-n-gram family, computed relationally ----
  // Per n: unnest the n-grams, count per (doc, gram), duplicate mass =
  // sum of counts over grams occurring more than once, total = all grams.
  // The Spark plan computes the same quantity per row from sorted-gram
  // run lengths — different formulation, identical answer. A document
  // with fewer than n tokens has no d<n> row and yields NULL fractions
  // (and a NULL keep via three-valued AND) on both sides.
  def q58Sql(): String = {
    val thresholds = Seq(5 -> "0.15", 6 -> "0.14", 7 -> "0.13",
      8 -> "0.12", 9 -> "0.11", 10 -> "0.10")
    val ctes = thresholds.map { case (n, _) =>
      val shingle = (0 until n).map(i => s"ws[i + $i]").mkString(" || ' ' || ")
      s"""g$n AS (
         |  SELECT doc_id, unnest([$shingle FOR i IN range(1, len(ws) - ${n - 2})]) AS g
         |  FROM base WHERE len(ws) >= $n
         |), d$n AS (
         |  SELECT doc_id, COALESCE(sum(c) FILTER (c > 1), 0) AS dup, sum(c) AS tot
         |  FROM (SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY 1, 2) GROUP BY 1
         |)""".stripMargin
    }.mkString(", ")
    val fracs = thresholds
      .map { case (n, _) => s"  d$n.dup / d$n.tot AS dup_${n}gram_frac" }
      .mkString(",\n")
    val keep = thresholds
      .map { case (n, t) => s"(d$n.dup / d$n.tot <= $t)" }
      .mkString(" AND ")
    val joins = thresholds
      .map { case (n, _) => s"LEFT JOIN d$n ON b.doc_id = d$n.doc_id" }
      .mkString("\n")
    s"""WITH base AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
       |), $ctes
       |SELECT b.doc_id,
       |$fracs,
       |  $keep AS dup_ngram_keep
       |FROM base b
       |$joins""".stripMargin
  }

  // ---- q61: deterministic stratified sample (k per group by hash) ----
  // Same portable 60-bit hash + salt scheme as Sampling.hashBucketSql; the
  // order (hash, then id) is total, so the k survivors per stratum are
  // engine-independent.
  def q61Sql(k: Int = 25, salt: String = "strat"): String = {
    val h = PortableHash.hash60Sql(s"'$salt:' || CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY $h, doc_id) AS rn
       |  FROM documents
       |) WHERE rn <= $k""".stripMargin
  }

  // ---- q62: real AVI decode metadata + sampled-frame pixel checksum ----
  // Mirrors q27Sql/q55Sql: the AVI generation parameters and per-frame
  // pixel formulas are deterministic in doc_id (Multimodal.vWidthFor/
  // vHeightFor/vFrameCountFor/vFpsFor/vRgbFor), so the oracle recomputes
  // what the from-scratch RIFF walk + DIB decode must recover. Sample
  // order: sampled frame (every `sampleEvery`-th), then row top-down,
  // then column, then R,G,B — exactly the decoder's fold order.
  def q62Sql(sampleEvery: Int = 2): String =
    s"""WITH params AS (
       |  SELECT doc_id,
       |    CAST(4 + doc_id % 5 AS INTEGER) AS width,
       |    CAST(3 + doc_id % 3 AS INTEGER) AS height,
       |    CAST(3 + doc_id % 4 AS INTEGER) AS n_frames,
       |    CAST(10 + doc_id % 5 AS INTEGER) AS fps,
       |    CAST((3 + doc_id % 4 + ${sampleEvery - 1}) // $sampleEvery AS INTEGER) AS n_sampled
       |  FROM documents
       |), px AS (
       |  SELECT doc_id, width, height, n_frames, fps, n_sampled,
       |    [CASE i % 3
       |       WHEN 0 THEN (doc_id + 7 * ((i // (width * height * 3)) * $sampleEvery)
       |                    + 31 * ((i % (width * 3)) // 3)
       |                    + 17 * ((i % (width * height * 3)) // (width * 3))) % 256
       |       WHEN 1 THEN (3 * doc_id + 11 * ((i // (width * height * 3)) * $sampleEvery)
       |                    + 7 * ((i % (width * 3)) // 3)
       |                    + 11 * ((i % (width * height * 3)) // (width * 3))) % 256
       |       ELSE (5 * doc_id + 13 * ((i // (width * height * 3)) * $sampleEvery)
       |             + 13 * ((i % (width * 3)) // 3)
       |             + 3 * ((i % (width * height * 3)) // (width * 3))) % 256
       |     END
       |     FOR i IN range(n_sampled * width * height * 3)] AS samples
       |  FROM params
       |)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  width, height, n_frames, fps, n_sampled,
       |  list_reduce(list_prepend(0::BIGINT, samples),
       |    (a, x) -> xor((a % ${1L << 55}) * 32 + (a >> 55), x)) AS checksum
       |FROM px""".stripMargin

  // ---- q30: OR-amplified hyperplane-LSH near-dup pairs ----
  def q30Sql(minCosine: Double = 0.4, nPlanes: Int = 12, nTables: Int = 2,
             dim: Int = 64, seed: Long = 42L): String = {
    val perTable = (0 until nTables).map { t =>
      val planes = VectorFunctions.seededPlanes(nPlanes, dim, seed + t)
      s"""  SELECT id_a, id_b, cos_sim FROM (
         |    SELECT a.id AS id_a, b.id AS id_b,
         |      round(list_dot_product(a.v, b.v) / (sqrt(a.nsq) * sqrt(b.nsq)), 6) AS cos_sim
         |    FROM (SELECT id, v, nsq, ${bucketSql("v", planes)} AS bucket FROM e) a
         |    JOIN (SELECT id, v, nsq, ${bucketSql("v", planes)} AS bucket FROM e) b
         |      USING (bucket)
         |    WHERE a.id < b.id)
         |  WHERE cos_sim >= $minCosine""".stripMargin
    }.mkString("\n  UNION\n")
    s"""WITH e AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
       |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nsq
       |  FROM embeddings
       |)
       |$perTable""".stripMargin
  }

  // ---- q208: embedding decontamination — q30Sql's per-table bucket
  // joins restricted to train×test (is_test flags the held-out slice);
  // UNION dedupes across the OR-amplified tables. ----
  def q208Sql(minCosine: Double = 0.4, nPlanes: Int = 12, nTables: Int = 2,
              dim: Int = 64, seed: Long = 42L,
              testMod: Long = 100L): String = {
    val perTable = (0 until nTables).map { t =>
      val planes = VectorFunctions.seededPlanes(nPlanes, dim, seed + t)
      s"""  SELECT train_id, test_id, cos_sim FROM (
         |    SELECT a.id AS train_id, b.id AS test_id,
         |      round(list_dot_product(a.v, b.v) / (sqrt(a.nsq) * sqrt(b.nsq)), 6) AS cos_sim
         |    FROM (SELECT id, v, nsq, ${bucketSql("v", planes)} AS bucket
         |          FROM e WHERE NOT is_test) a
         |    JOIN (SELECT id, v, nsq, ${bucketSql("v", planes)} AS bucket
         |          FROM e WHERE is_test) b
         |      USING (bucket))
         |  WHERE cos_sim >= $minCosine""".stripMargin
    }.mkString("\n  UNION\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id AS id, vec_id % $testMod = 0 AS is_test,
       |    embedding::DOUBLE[] AS v,
       |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nsq
       |  FROM embeddings
       |)
       |$perTable""".stripMargin
  }

  // ---- q51: incremental embedding near-dup ingest (hyperplane LSH) ----
  // q30Sql's per-table bucket joins with q50Sql's generation predicate:
  // batch (gen 3) × store (gen < 3) in either id order plus batch×batch
  // with id_a < id_b — never store×store. UNION dedupes across the
  // OR-amplified tables, mirroring IncrementalAnn.ingestNearDups.
  def q51Sql(minCosine: Double = 0.4, nPlanes: Int = 12, nTables: Int = 2,
             dim: Int = 64, seed: Long = 42L): String = {
    val perTable = (0 until nTables).map { t =>
      val planes = VectorFunctions.seededPlanes(nPlanes, dim, seed + t)
      s"""  SELECT id_a, id_b, cos_sim FROM (
         |    SELECT a.id AS id_a, b.id AS id_b,
         |      round(list_dot_product(a.v, b.v) / (sqrt(a.nsq) * sqrt(b.nsq)), 6) AS cos_sim
         |    FROM (SELECT id, gen, v, nsq, ${bucketSql("v", planes)} AS bucket FROM e) a
         |    JOIN (SELECT id, gen, v, nsq, ${bucketSql("v", planes)} AS bucket FROM e) b
         |      USING (bucket)
         |    WHERE b.gen = 3
         |      AND (a.gen < 3 OR (a.gen = 3 AND a.id < b.id)))
         |  WHERE cos_sim >= $minCosine""".stripMargin
    }.mkString("\n  UNION\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id AS id, vec_id % 4 AS gen, embedding::DOUBLE[] AS v,
       |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nsq
       |  FROM embeddings
       |)
       |$perTable""".stripMargin
  }

  // ---- q44: org-change paths derivation over the supplier-key graph ----
  // Mirrors pipelines.OrgChangePaths.derivePaths stage by stage: path
  // expansion (m1-m3), original-path filter, per-hop name-change refinement
  // (independent per hop — refining ct_i never feeds hop i+1's inputs),
  // then the sequential split_from_multiple rounds and the final
  // classification join.
  def q44Sql(): String = {
    def hop(i: Int, prevRel: String, prevCode: String): String =
      s"""m$i AS MATERIALIZED (
         |  SELECT m.*, e.dst AS nc$i, e.d AS dc$i,
         |    CASE WHEN e.dst IS NULL THEN NULL
         |         WHEN ec.nsucc > 1 THEN 'split' ELSE 'mnc' END AS ct$i
         |  FROM $prevRel m
         |  LEFT JOIN edges e ON m.$prevCode = e.src
         |  LEFT JOIN ecnt ec ON e.src = ec.src
         |)""".stripMargin
    def ncc(i: Int, prevCode: String): String =
      s"""ncc$i AS MATERIALIZED (
         |  SELECT nc$i AS c FROM orig0
         |  WHERE nc$i IN (SELECT nc$i FROM orig0 WHERE ct$i = 'mnc')
         |  GROUP BY nc$i HAVING count(DISTINCT $prevCode) = 1
         |)""".stripMargin
    def refinedCt(i: Int): String =
      s"""CASE WHEN nc$i IN (SELECT c FROM ncc$i) THEN 'name_change'
         |     WHEN ct$i = 'mnc' THEN 'merger' ELSE ct$i END AS ct$i""".stripMargin
    def sfmRound(i: Int, prevRel: String, prevCode: String): String =
      s"""s$i AS MATERIALIZED (
         |  SELECT nc$i AS c FROM $prevRel
         |  WHERE ct$i = 'split' AND dpc = 'no'
         |  GROUP BY nc$i HAVING count(DISTINCT $prevCode) > 1
         |), c$i AS MATERIALIZED (
         |  SELECT * REPLACE (CASE WHEN nc$i IN (SELECT c FROM s$i) AND adj = 0
         |    THEN 'split_from_multiple' ELSE dpc END AS dpc)
         |  FROM $prevRel
         |)""".stripMargin
    s"""WITH sup AS (SELECT s_suppkey AS v FROM supplier),
       |edges AS MATERIALIZED (
       |  SELECT CAST(v AS VARCHAR) AS src,
       |    CAST(CASE WHEN v % 27 <= 17 THEN v - (v % 27) ELSE v - 9 END AS VARCHAR) AS dst,
       |    DATE '2000-01-01' + CAST(v % 5000 AS INT) AS d
       |  FROM sup WHERE v % 27 >= 9
       |  UNION ALL
       |  SELECT CAST(v AS VARCHAR), CAST(v - 10 AS VARCHAR),
       |    DATE '2000-01-01' + CAST(v % 5000 AS INT)
       |  FROM sup WHERE v % 27 = 22
       |),
       |ecnt AS MATERIALIZED (SELECT src, count(*) AS nsucc FROM edges GROUP BY src),
       |m0 AS MATERIALIZED (
       |  SELECT code AS old_code, code AS new_code_0 FROM (
       |    SELECT DISTINCT src AS code FROM edges
       |    UNION SELECT DISTINCT dst FROM edges)
       |),
       |${hop(1, "m0", "new_code_0")},
       |${hop(2, "m1", "nc1")},
       |${hop(3, "m2", "nc2")},
       |pth AS MATERIALIZED (SELECT * FROM m3 WHERE nc1 IS NOT NULL),
       |succ AS (
       |  SELECT DISTINCT c FROM (
       |    SELECT nc1 AS c FROM pth WHERE nc1 IS NOT NULL
       |    UNION ALL SELECT nc2 FROM pth WHERE nc2 IS NOT NULL
       |    UNION ALL SELECT nc3 FROM pth WHERE nc3 IS NOT NULL)
       |),
       |orig0 AS MATERIALIZED (SELECT * FROM pth WHERE old_code NOT IN (SELECT c FROM succ)),
       |${ncc(1, "new_code_0")},
       |${ncc(2, "nc1")},
       |${ncc(3, "nc2")},
       |orig AS MATERIALIZED (
       |  SELECT old_code, new_code_0, nc1, dc1, nc2, dc2, nc3, dc3,
       |    ${refinedCt(1)},
       |    ${refinedCt(2)},
       |    ${refinedCt(3)}
       |  FROM orig0
       |),
       |origf AS MATERIALIZED (
       |  SELECT *, coalesce(nc3, nc2, nc1) AS final_code,
       |    CASE WHEN 'split' IN (ct1, ct2, ct3) THEN 1 ELSE 0 END AS es
       |  FROM orig
       |),
       |linked AS MATERIALIZED (
       |  SELECT DISTINCT c FROM (
       |    SELECT old_code AS c FROM origf WHERE es = 1
       |    UNION ALL SELECT nc1 FROM origf WHERE es = 1
       |    UNION ALL SELECT nc2 FROM origf WHERE es = 1
       |    UNION ALL SELECT nc3 FROM origf WHERE es = 1)
       |  WHERE c IS NOT NULL
       |),
       |c0 AS MATERIALIZED (
       |  SELECT *,
       |    CASE WHEN 'merger' IN (ct1, ct2, ct3) AND 'split' IN (ct1, ct2, ct3)
       |           THEN 'later_merger'
       |         WHEN 'name_change' IN (ct1, ct2, ct3) AND 'split' IN (ct1, ct2, ct3)
       |           THEN 'later_name_change'
       |         ELSE 'no' END AS dpc,
       |    CASE WHEN es = 0 THEN 1 ELSE 0 END AS adj
       |  FROM origf
       |  WHERE old_code IN (SELECT c FROM linked) OR nc1 IN (SELECT c FROM linked)
       |     OR nc2 IN (SELECT c FROM linked) OR nc3 IN (SELECT c FROM linked)
       |),
       |${sfmRound(1, "c0", "new_code_0")},
       |${sfmRound(2, "c1", "nc1")},
       |${sfmRound(3, "c2", "nc2")},
       |sic AS MATERIALIZED (SELECT DISTINCT old_code FROM c3 WHERE dpc = 'split_from_multiple'),
       |c4 AS MATERIALIZED (
       |  SELECT * REPLACE (CASE WHEN old_code IN (SELECT old_code FROM sic)
       |    AND dpc = 'no' THEN 1 ELSE adj END AS adj)
       |  FROM c3
       |),
       |ncs AS MATERIALIZED (
       |  SELECT final_code FROM c4 GROUP BY final_code
       |  HAVING max(adj) = 0 AND min(CASE WHEN dpc = 'no' THEN 1 ELSE 0 END) = 1
       |),
       |pcp AS MATERIALIZED (
       |  SELECT DISTINCT final_code FROM c4
       |  WHERE final_code NOT IN (SELECT final_code FROM ncs)
       |),
       |c5 AS MATERIALIZED (SELECT * FROM c4 WHERE final_code IN (SELECT final_code FROM pcp))
       |SELECT o.old_code, o.new_code_0,
       |  o.nc1 AS new_code_1, o.dc1 AS date_change_1, o.ct1 AS change_type_1,
       |  o.nc2 AS new_code_2, o.dc2 AS date_change_2, o.ct2 AS change_type_2,
       |  o.nc3 AS new_code_3, o.dc3 AS date_change_3, o.ct3 AS change_type_3,
       |  o.final_code, CAST(o.es AS BIGINT) AS experiences_split,
       |  coalesce(c.dpc, 'no') AS direct_path_complicated,
       |  CAST(coalesce(c.adj, 0) AS BIGINT) AS adjacent_to_complicated,
       |  CAST(CASE WHEN o.final_code IN (SELECT final_code FROM pcp)
       |    THEN 1 ELSE 0 END AS BIGINT) AS part_of_complicated_path
       |FROM origf o
       |LEFT JOIN c5 c
       |  ON o.old_code = c.old_code
       | AND o.nc1 IS NOT DISTINCT FROM c.nc1
       | AND o.nc2 IS NOT DISTINCT FROM c.nc2
       | AND o.nc3 IS NOT DISTINCT FROM c.nc3""".stripMargin
  }

  // ---- q45: corpus top-k bigrams ----
  def q45Sql(k: Int = 50): String =
    s"""WITH tok AS (
       |  SELECT regexp_extract_all(text, '\\S+') AS ws FROM documents
       |), g AS (
       |  SELECT unnest([ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))]) AS gram
       |  FROM tok WHERE len(ws) >= 2
       |), c AS (
       |  SELECT gram, count(*) AS n FROM g GROUP BY gram
       |)
       |SELECT gram, n, CAST(row_number() OVER (ORDER BY n DESC, gram) AS BIGINT) AS rank
       |FROM c ORDER BY n DESC, gram LIMIT $k""".stripMargin

  // ---- q46: deterministic split + hash-fraction sample ----
  def q46Sql(): String = {
    import graft.operators.Sampling
    s"""WITH b AS (
       |  SELECT doc_id,
       |    ${Sampling.hashBucketSql("doc_id", "graft", 100)} AS bucket,
       |    ${Sampling.hashBucketSql("doc_id", "sample")} AS sb
       |  FROM documents
       |)
       |SELECT doc_id, bucket,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
       |  sb < 1000 AS in_10pct_sample
       |FROM b""".stripMargin
  }

  // ---- q48: PII redaction (same regex chain, RE2-compatible patterns) ----
  def q48Sql(): String = {
    import graft.functions.TextFunctions
    val suffix = " contact: john.doe@example.org or +44 20 7946 0958 at 192.168.0.1"
    def chain(e: String): String =
      s"""regexp_replace(regexp_replace(regexp_replace($e,
         |  '${TextFunctions.EmailRe}', '<EMAIL>', 'g'),
         |  '${TextFunctions.Ipv4Re}', '<IP>', 'g'),
         |  '${TextFunctions.PhoneRe}', '<PHONE>', 'g')""".stripMargin
    s"""SELECT doc_id,
       |  ${chain(s"text || '$suffix'")} AS clean_text,
       |  ${chain("text")} <> text AS had_pii
       |FROM documents""".stripMargin
  }

  // ---- q49: weighted corpus mixture (hash-downsampled union) ----
  // Same per-corpus salts ("mix:<name>") and the same cut arithmetic
  // ((rate * buckets).toLong) as Sampling.mixCorpora/sampleFraction.
  def q49Sql(): String = {
    import graft.operators.Sampling
    def part(name: String, pred: String, rate: Double): String = {
      val cut = (rate * 10000).toLong
      s"""SELECT doc_id, source, '$name' AS corpus FROM documents
         |WHERE $pred
         |  AND ${Sampling.hashBucketSql("doc_id", s"mix:$name")} < $cut""".stripMargin
    }
    val srcNum = "CAST(substr(source, 4) AS INT)"
    Seq(part("web", s"$srcNum < 7", 0.5),
        part("books", s"$srcNum >= 7 AND $srcNum < 14", 0.8),
        part("code", s"$srcNum >= 14", 0.25))
      .mkString("\nUNION ALL\n")
  }

  // ---- q50: incremental near-dup ingest (portable MinHash-LSH) ----
  // Same tok/sh/hs/sig chain and constants as q22Sql; the generation split
  // (doc_id % 4: 0-2 = store, 3 = new batch) and the pair predicate mirror
  // IncrementalDedup.ingestCandidates: batch×store in either id order plus
  // batch×batch with doc_a < doc_b — never store×store.
  def q50Sql(shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
             seed: Long = 42L): String = {
    val rows = numHashes / bands
    val consts = PortableHash.permConstants(numHashes, seed)
    val mins = consts.zipWithIndex.map { case ((r, c), j) =>
      s"min(${PortableHash.permuteSql("h", r, c)}) AS m$j"
    }.mkString(",\n      ")
    val sigList = (0 until numHashes).map(j => s"m$j").mkString("[", ", ", "]")
    val shingle = (0 until shingleK).map(i => s"ws[i + $i]").mkString(" || ' ' || ")
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |    unnest([$shingle FOR i IN range(1, len(ws) - ${shingleK - 2})]) AS g
       |  FROM tok WHERE len(ws) >= $shingleK
       |), hs AS (
       |  SELECT doc_id, ${PortableHash.hash60Sql("g")} AS h FROM sh
       |), sig AS MATERIALIZED (
       |  SELECT doc_id, doc_id % 4 AS gen, $sigList AS sig FROM (
       |    SELECT doc_id,
       |      $mins
       |    FROM hs GROUP BY doc_id)
       |), banded AS (
       |  SELECT doc_id, gen, b, sig[(b * $rows + 1):(b * $rows + $rows)] AS bucket
       |  FROM sig, (SELECT unnest(range(0, $bands)) AS b)
       |), pairs AS (
       |  SELECT DISTINCT s.doc_id AS doc_a, n.doc_id AS doc_b
       |  FROM banded s JOIN banded n ON s.b = n.b AND s.bucket = n.bucket
       |  WHERE n.gen = 3
       |    AND (s.gen < 3 OR (s.gen = 3 AND s.doc_id < n.doc_id))
       |)
       |SELECT p.doc_a, p.doc_b,
       |  round(CAST(list_sum([CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END
       |                       FOR j IN range(1, ${numHashes + 1})]) AS DOUBLE)
       |        / $numHashes.0, 4) AS est_jaccard
       |FROM pairs p
       |JOIN sig sa ON p.doc_a = sa.doc_id
       |JOIN sig sb ON p.doc_b = sb.doc_id""".stripMargin
  }

  // ---- q53: benchmark decontamination (portable-hashed k-gram overlap) ----
  // Mirrors Decontaminate.overlaps with hashGrams = true: per-document
  // DISTINCT gram hashes (DISTINCT doc_id, h ≡ Spark's per-row
  // array_distinct over the hashed array), benchmark = doc_id % 10 = 7.
  /** Shared CTE chain for q53/q56: per-document distinct 4-gram hash keys
    * plus the benchmark slice's key set (doc_id % 10 = 7 is the held-out
    * "benchmark").
    */
  private def gramKeysCtes(k: Int): String = {
    val shingle = (0 until k).map(i => s"ws[i + $i]").mkString(" || ' ' || ")
    s"""tok AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |    unnest([$shingle FOR i IN range(1, len(ws) - ${k - 2})]) AS g
       |  FROM tok WHERE len(ws) >= $k
       |), keys AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ${PortableHash.hash60Sql("g")} AS h FROM sh
       |), bench AS (
       |  SELECT DISTINCT h FROM keys WHERE doc_id % 10 = 7
       |)""".stripMargin
  }

  def q53Sql(k: Int = 4): String =
    s"""WITH ${gramKeysCtes(k)}
       |SELECT kk.doc_id, count(*) AS n_shared_grams
       |FROM keys kk JOIN bench USING (h)
       |WHERE kk.doc_id % 10 != 7
       |GROUP BY kk.doc_id""".stripMargin

  // ---- q56: the decontaminated corpus — training docs with NO shared
  // gram (Decontaminate.clean's anti-join). Docs too short to produce a
  // k-gram have no keys row, overlap nothing, and are kept — both sides.
  def q56Sql(k: Int = 4): String =
    s"""WITH ${gramKeysCtes(k)}
       |SELECT d.doc_id
       |FROM documents d
       |WHERE d.doc_id % 10 != 7
       |  AND NOT EXISTS (
       |    SELECT 1 FROM keys kk JOIN bench USING (h)
       |    WHERE kk.doc_id = d.doc_id)""".stripMargin

  // ---- q32: IVF coarse-quantized top-k (+ Lloyd refinement rounds) ----
  // Each Lloyd round reassigns the corpus to the current centroid set and
  // re-averages per (cell, dimension). The mean is a SORTED left-fold sum /
  // count — the same order-independent formulation Similarity.ivfTopK uses —
  // so the refined centroids are bit-identical to Spark's driver-side values
  // and the downstream assignment/probe arithmetic stays exact.
  def q32Sql(k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
             centroidStride: Long = 31L, nQueries: Int = 5,
             lloydRounds: Int = 1,
             queryPredSql: Option[String] = None,
             corpusPredSql: Option[String] = None): String = {
    // the query-set predicate: q32's id-prefix by default; q217 passes the
    // streamed-subset predicate instead (same replay otherwise)
    val qPred = queryPredSql.getOrElse(s"q.vec_id < $nQueries")
    // the corpus predicate models DELETION (q260): candidates are drawn
    // from the surviving corpus only, while the quantizer (cents0) and
    // the query set still see every embedding — deletion never retrains
    // the coarse quantizer, and external queries may be deleted documents
    val cPred = corpusPredSql.getOrElse("TRUE")
    val lloyd = (0 until lloydRounds).map { i =>
      s"""assigned$i AS MATERIALIZED (
         |  SELECT cand_id, cv, cid AS cell_id FROM (
         |    SELECT c.cand_id, c.cv, ct.cid,
         |      row_number() OVER (PARTITION BY c.cand_id
         |        ORDER BY list_dot_product(c.cv, ct.cvec) / ct.cnorm DESC, ct.cid) AS rn
         |    FROM corpus c CROSS JOIN cents$i ct)
         |  WHERE rn = 1
         |), means$i AS (
         |  SELECT cell_id, pos,
         |    list_reduce(list_prepend(0.0::DOUBLE, list_sort(list(x))), (a, xx) -> a + xx)
         |      / count(*) AS m
         |  FROM (SELECT cell_id, unnest(cv) AS x, unnest(range(0, len(cv))) AS pos
         |        FROM assigned$i)
         |  GROUP BY cell_id, pos
         |), cents${i + 1} AS MATERIALIZED (
         |  SELECT * FROM (
         |    SELECT cell_id AS cid, list(m ORDER BY pos) AS cvec,
         |      sqrt(list_dot_product(list(m ORDER BY pos), list(m ORDER BY pos))) AS cnorm
         |    FROM means$i GROUP BY cell_id)
         |  WHERE cnorm > 0
         |), """.stripMargin
    }.mkString
    s"""WITH cents0 AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec,
       |      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cnorm
       |    FROM embeddings WHERE vec_id % $centroidStride = 0
       |    ORDER BY vec_id LIMIT $nlist)
       |  WHERE cnorm > 0
       |), corpus AS MATERIALIZED (
       |  SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv,
       |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS cn
       |  FROM embeddings WHERE $cPred
       |), ${lloyd}assigned AS (
       |  SELECT cand_id, cv, cn, cid AS cell_id FROM (
       |    SELECT c.cand_id, c.cv, c.cn, ct.cid,
       |      row_number() OVER (PARTITION BY c.cand_id
       |        ORDER BY list_dot_product(c.cv, ct.cvec) / ct.cnorm DESC, ct.cid) AS rn
       |    FROM corpus c CROSS JOIN cents$lloydRounds ct)
       |  WHERE rn = 1
       |), probes AS (
       |  SELECT query_id, qv, qn, cid AS cell_id FROM (
       |    SELECT q.vec_id AS query_id, q.embedding::DOUBLE[] AS qv,
       |      list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS qn,
       |      ct.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.embedding::DOUBLE[], ct.cvec) / ct.cnorm DESC,
       |                 ct.cid) AS rn
       |    FROM embeddings q CROSS JOIN cents$lloydRounds ct WHERE $qPred)
       |  WHERE rn <= $nprobe
       |), scored AS (
       |  SELECT p.query_id, a.cand_id,
       |    round(list_dot_product(p.qv, a.cv) / (sqrt(p.qn) * sqrt(a.cn)), 6) AS cos_sim
       |  FROM assigned a JOIN probes p USING (cell_id)
       |  WHERE p.query_id <> a.cand_id
       |)
       |SELECT query_id, cand_id, cos_sim, CAST(rn AS BIGINT) AS rank FROM (
       |  SELECT query_id, cand_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, cand_id) AS rn
       |  FROM scored) WHERE rn <= $k""".stripMargin
  }

  // ---- q68: count-min sketch frequency estimates for the exact top-k ----
  // The sketch is replayed relationally: one (j, bucket) row per token
  // occurrence per hash row (UNION ALL over the same driver-side
  // constants the Spark plan embeds), grouped into bucket counts, then
  // min-joined against the exact top-k probes.
  def q68Sql(depth: Int = 4, width: Int = 256, topK: Int = 20,
             seed: Long = 42L): String = {
    val consts = PortableHash.permConstants(depth, seed)
    val jb = consts.zipWithIndex.map { case ((r, c), j) =>
      s"SELECT token, $j AS j, ${PortableHash.permuteSql("h", r, c)} % $width AS bucket FROM h"
    }.mkString("\n  UNION ALL ")
    val pjb = consts.zipWithIndex.map { case ((r, c), j) =>
      s"SELECT token, exact_n, $j AS j, ${PortableHash.permuteSql("h", r, c)} % $width AS bucket FROM ph"
    }.mkString("\n  UNION ALL ")
    s"""WITH tok AS (
       |  SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents
       |), h AS (
       |  SELECT token, ${PortableHash.hash60Sql("token")} AS h FROM tok
       |), jb AS (
       |  $jb
       |), sk AS (
       |  SELECT j, bucket, count(*) AS cnt FROM jb GROUP BY 1, 2
       |), exact AS (
       |  SELECT token, count(*) AS exact_n FROM tok GROUP BY 1
       |  ORDER BY exact_n DESC, token LIMIT $topK
       |), ph AS (
       |  SELECT token, exact_n, ${PortableHash.hash60Sql("token")} AS h FROM exact
       |), pjb AS (
       |  $pjb
       |)
       |SELECT token, exact_n, min(COALESCE(sk.cnt, 0)) AS est_n
       |FROM pjb LEFT JOIN sk USING (j, bucket)
       |GROUP BY token, exact_n""".stripMargin
  }

  // ---- q84: CMS heavy hitters — the sketch replays exactly as in q68;
  // the threshold is ceil(phi·N) over the total occurrence count (the
  // same IEEE double product both engines compute), and a token survives
  // iff its sketch estimate AND its exact count clear it — the same
  // prefilter + exact-verify semantics as the Spark plan.
  def q84Sql(phi: Double = 0.05, depth: Int = 4, width: Int = 1024,
             seed: Long = 42L): String = {
    val consts = PortableHash.permConstants(depth, seed)
    val jb = consts.zipWithIndex.map { case ((r, c), j) =>
      s"SELECT token, $j AS j, ${PortableHash.permuteSql("h", r, c)} % $width AS bucket FROM h"
    }.mkString("\n  UNION ALL ")
    val djb = consts.zipWithIndex.map { case ((r, c), j) =>
      s"SELECT token, $j AS j, ${PortableHash.permuteSql("h", r, c)} % $width AS bucket FROM dh"
    }.mkString("\n  UNION ALL ")
    s"""WITH tok AS (
       |  SELECT substr(unnest(regexp_extract_all(text, '\\S+')), 1, 1) AS token
       |  FROM documents
       |), thresh AS (
       |  SELECT GREATEST(1, CAST(ceil($phi * count(*)) AS BIGINT)) AS t FROM tok
       |), h AS (
       |  SELECT token, ${PortableHash.hash60Sql("token")} AS h FROM tok
       |), jb AS (
       |  $jb
       |), sk AS (
       |  SELECT j, bucket, count(*) AS cnt FROM jb GROUP BY 1, 2
       |), dh AS (
       |  SELECT DISTINCT token, ${PortableHash.hash60Sql("token")} AS h FROM tok
       |), djb AS (
       |  $djb
       |), est AS (
       |  SELECT token, min(COALESCE(sk.cnt, 0)) AS est_n
       |  FROM djb LEFT JOIN sk USING (j, bucket) GROUP BY token
       |), exact AS (
       |  SELECT token, count(*) AS exact_n FROM tok GROUP BY 1
       |)
       |SELECT e.token, x.exact_n, e.est_n
       |FROM est e JOIN exact x USING (token) CROSS JOIN thresh
       |WHERE e.est_n >= thresh.t AND x.exact_n >= thresh.t""".stripMargin
  }

  // ---- q93: fixed-point PageRank — every iteration unrolled as a plain
  // CTE (SQL forbids aggregation in a recursive term); all arithmetic is
  // integer (// division, exact commutative long sums), so the ranks
  // replay to the last bit with no tolerance.
  def q93Sql(iterations: Int = 5, scale: Long = 1000000000000L,
             dampNum: Long = 85, dampDen: Long = 100): String = {
    val base = s"(($scale * ${dampDen - dampNum}) // $dampDen) // c.n"
    // AS MATERIALIZED on every round-chain CTE: e/deg/nodes/c are
    // referenced in EVERY round, and without materialization DuckDB
    // re-expands each reference's upstream chain — ~5 re-derivations of
    // the 12M-row DISTINCT edge set PER ROUND at sf1, which spilled
    // >78 GB of temp before ENOSPC in the r13 sf1 run (the q133 lesson).
    val iters = (1 to iterations).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT nodes.node,
         |    $base + (COALESCE(m.in_mass, 0) * $dampNum) // $dampDen AS rank
         |  FROM nodes CROSS JOIN c
         |  LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS in_mass
         |    FROM r${i - 1} r JOIN e ON r.node = e.src JOIN deg d ON d.src = e.src
         |    GROUP BY 1) m USING (node)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT 'p' || CAST(l_partkey AS VARCHAR) AS p,
       |         's' || CAST(l_suppkey AS VARCHAR) AS s
       |  FROM lineitem
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT p AS src, s AS dst FROM pairs
       |    UNION ALL SELECT s AS src, p AS dst FROM pairs)
       |), deg AS MATERIALIZED (
       |  SELECT src, count(*) AS outdeg FROM e GROUP BY 1
       |), nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
       |), c AS MATERIALIZED (
       |  SELECT count(*) AS n FROM nodes
       |), r0 AS MATERIALIZED (
       |  SELECT node, $scale // c.n AS rank FROM nodes CROSS JOIN c
       |), $iters
       |SELECT node, rank FROM r$iterations""".stripMargin
  }

  // ---- q219: multi-source BFS hop distances, unrolled round by round —
  // d_{k+1}(v) = min(d_k(v), 1 + min over in-edges of d_k(src)), the
  // exact recurrence both engine paths run. Every round CTE is
  // AS MATERIALIZED (the q93/q185 re-expansion lesson).
  def q219Sql(rounds: Int = 4, seedMaxPartkey: Long = 3L): String = {
    val iters = (1 to rounds).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, d.dist + 1 AS dist
         |    FROM e JOIN d${k - 1} d ON d.node = e.src
         |  ) GROUP BY node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT 'p' || CAST(l_partkey AS VARCHAR) AS p,
       |         's' || CAST(l_suppkey AS VARCHAR) AS s
       |  FROM lineitem
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT p AS src, s AS dst FROM pairs
       |    UNION ALL SELECT s AS src, p AS dst FROM pairs)
       |), d0 AS MATERIALIZED (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS node,
       |    0::BIGINT AS dist
       |  FROM lineitem WHERE l_partkey < $seedMaxPartkey
       |), $iters
       |SELECT node, CAST(dist AS BIGINT) AS dist FROM d$rounds""".stripMargin
  }

  // ---- q224/q225: landmark distance sketches — the q219 recurrence
  // with the landmark identity as state (grouped by (node, lm)); q225
  // adds the min-sum estimate over a part × supplier query grid. Every
  // round CTE AS MATERIALIZED.
  private def landmarkChain(rounds: Int, lmMaxPartkey: Long): String = {
    val iters = (1 to rounds).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT node, lm, min(dist) AS dist FROM (
         |    SELECT node, lm, dist FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, d.lm, d.dist + 1 AS dist
         |    FROM e JOIN d${k - 1} d ON d.node = e.src
         |  ) GROUP BY node, lm
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT 'p' || CAST(l_partkey AS VARCHAR) AS p,
       |         's' || CAST(l_suppkey AS VARCHAR) AS s
       |  FROM lineitem
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT p AS src, s AS dst FROM pairs
       |    UNION ALL SELECT s AS src, p AS dst FROM pairs)
       |), d0 AS MATERIALIZED (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS node,
       |    'p' || CAST(l_partkey AS VARCHAR) AS lm, 0::BIGINT AS dist
       |  FROM lineitem WHERE l_partkey < $lmMaxPartkey
       |), $iters""".stripMargin
  }

  def q224Sql(rounds: Int = 4, lmMaxPartkey: Long = 3L): String =
    s"""${landmarkChain(rounds, lmMaxPartkey)}
       |SELECT node, lm, CAST(dist AS BIGINT) AS dist FROM d$rounds""".stripMargin

  def q225Sql(rounds: Int = 4, lmMaxPartkey: Long = 3L,
              aMaxPartkey: Long = 10L, bMaxSuppkey: Long = 10L): String =
    s"""${landmarkChain(rounds, lmMaxPartkey)},
       |ua AS (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS node
       |  FROM lineitem WHERE l_partkey < $aMaxPartkey
       |), vb AS (
       |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS node
       |  FROM lineitem WHERE l_suppkey < $bMaxSuppkey
       |)
       |SELECT da.node AS node_a, db.node AS node_b,
       |  CAST(min(da.dist + db.dist) AS BIGINT) AS est
       |FROM d$rounds da JOIN d$rounds db ON da.lm = db.lm
       |WHERE da.node IN (SELECT node FROM ua)
       |  AND db.node IN (SELECT node FROM vb)
       |GROUP BY 1, 2""".stripMargin

  // ---- q267: harmonic closeness from the landmark table — the q224
  // chain plus one exact-integer aggregate (each term 10⁶ // dist; sum
  // CAST back to BIGINT — DuckDB widens BIGINT sums to HUGEINT).
  def q267Sql(rounds: Int = 4, lmMaxPartkey: Long = 3L): String =
    s"""${landmarkChain(rounds, lmMaxPartkey)}
       |SELECT node, CAST(count(*) AS BIGINT) AS n_landmarks,
       |  CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_ppm
       |FROM d$rounds WHERE dist > 0 GROUP BY 1""".stripMargin

  // ---- q220: weighted shortest paths — the q219 unroll with dist + w
  // in place of dist + 1: d_{k+1}(v) = min(d_k(v), min over in-edges
  // (u,v) of d_k(u) + w(u,v)). Edge weight = 1 + l_orderkey % 5,
  // parallel edges collapse to their min (the cheapest always wins
  // under min-plus). Every round CTE AS MATERIALIZED.
  def q220Sql(rounds: Int = 4, seedMaxPartkey: Long = 3L): String = {
    val iters = (1 to rounds).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, d.dist + e.w AS dist
         |    FROM e JOIN d${k - 1} d ON d.node = e.src
         |  ) GROUP BY node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT 'p' || CAST(l_partkey AS VARCHAR) AS p,
       |         's' || CAST(l_suppkey AS VARCHAR) AS s,
       |         CAST(1 + l_orderkey % 5 AS BIGINT) AS w
       |  FROM lineitem
       |), e AS MATERIALIZED (
       |  SELECT src, dst, min(w) AS w FROM (
       |    SELECT p AS src, s AS dst, w FROM pairs
       |    UNION ALL SELECT s AS src, p AS dst, w FROM pairs)
       |  GROUP BY 1, 2
       |), d0 AS MATERIALIZED (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS node,
       |    0::BIGINT AS dist
       |  FROM lineitem WHERE l_partkey < $seedMaxPartkey
       |), $iters
       |SELECT node, CAST(dist AS BIGINT) AS dist FROM d$rounds""".stripMargin
  }

  // ---- q191: more-like-this — the anchor's top-m terms by tf·rarity
  // (same doubles, same tiebreak), then the q71 BM25 replay with the
  // per-term components PIVOTED into alphabetical positions and summed
  // left-associated in that fixed order — matching Spark's
  // sorted-term-column reduce bit for bit.
  def q191Sql(anchorId: Long = 0L, numTerms: Int = 5, topK: Int = 10,
              k1: Double = 1.2, b: Double = 0.75): String = {
    val score = (1 to numTerms).map(i =>
      s"COALESCE(max(CASE WHEN arn = $i THEN sc END), 0)").mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
       |), per AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM base
       |), tf AS (
       |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(ws) AS t FROM base) GROUP BY 1, 2
       |), dfq AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) AS total_dl FROM per
       |), sel AS (
       |  SELECT t, row_number() OVER (
       |      ORDER BY a.tf * ((agg.n_docs - d.df + 0.5) / (d.df + 0.5)) DESC, t
       |    ) AS rn
       |  FROM tf a JOIN dfq d USING (t) CROSS JOIN agg
       |  WHERE a.doc_id = $anchorId
       |), selm AS (
       |  SELECT t, row_number() OVER (ORDER BY t) AS arn
       |  FROM sel WHERE rn <= $numTerms
       |), comp AS (
       |  SELECT p.doc_id, s.arn, COALESCE(tf.tf, 0) AS tfv,
       |    ((agg.n_docs - d.df) + 5.0e-01) / (d.df + 5.0e-01) *
       |      ((CAST(COALESCE(tf.tf, 0) AS DOUBLE) * ${dbl(k1 + 1)}) /
       |       (CAST(COALESCE(tf.tf, 0) AS DOUBLE) + ${dbl(k1)} * (${dbl(1 - b)} +
       |        (${dbl(b)} * (p.dl / (CAST(agg.total_dl AS DOUBLE) / agg.n_docs)))))) AS sc
       |  FROM per p
       |  CROSS JOIN selm s
       |  JOIN dfq d ON d.t = s.t
       |  LEFT JOIN tf ON tf.doc_id = p.doc_id AND tf.t = s.t
       |  CROSS JOIN agg
       |), scored AS (
       |  SELECT doc_id, $score AS score
       |  FROM comp GROUP BY doc_id HAVING sum(tfv) > 0
       |)
       |SELECT doc_id, score FROM scored WHERE doc_id <> $anchorId
       |ORDER BY score DESC, doc_id LIMIT $topK""".stripMargin
  }

  // ---- q196: weighted PageRank — the q93 unroll with per-edge
  // ⌊rank·w/W⌋ contributions (multiplicities NOT collapsed — they ARE
  // the weights).
  def q196Sql(iterations: Int = 5, scale: Long = 1000000000000L,
              dampNum: Long = 85, dampDen: Long = 100): String = {
    val base = s"(($scale * ${dampDen - dampNum}) // $dampDen) // c.n"
    val iters = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT nodes.node,
         |    $base + (COALESCE(m.in_mass, 0) * $dampNum) // $dampDen AS rank
         |  FROM nodes CROSS JOIN c
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |           CAST(sum(r.rank * e.w // d.wsum) AS BIGINT) AS in_mass
         |    FROM r${i - 1} r JOIN e ON r.node = e.src JOIN deg d ON d.src = e.src
         |    GROUP BY 1) m USING (node)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT 'p' || CAST(l_partkey AS VARCHAR) AS p,
       |         's' || CAST(l_suppkey AS VARCHAR) AS s
       |  FROM lineitem
       |), e AS (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
       |    SELECT p AS src, s AS dst FROM pairs
       |    UNION ALL SELECT s AS src, p AS dst FROM pairs)
       |  GROUP BY 1, 2
       |), deg AS (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM e GROUP BY 1
       |), nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
       |), c AS (
       |  SELECT count(*) AS n FROM nodes
       |), r0 AS (
       |  SELECT node, $scale // c.n AS rank FROM nodes CROSS JOIN c
       |), $iters
       |SELECT node, rank FROM r$iterations""".stripMargin
  }

  // ---- q199: weighted + personalized PageRank over the q184
  // co-engagement graph — the q196 per-edge ⌊rank·w/W⌋ unroll with
  // q190's seed-flag CASE on the base/start; the co-engagement CTEs are
  // MATERIALIZED because every round references them (the q133
  // exponential-CTE lesson). Seeds = the 5 smallest item ids in the
  // graph (ORDER BY LIMIT — deterministic at every scale).
  def q199Sql(iterations: Int = 5, scale: Long = 1000000000000L,
              dampNum: Long = 85, dampDen: Long = 100,
              maxItemsPerUser: Int = 20, minUsers: Long = 2,
              numSeeds: Int = 5): String = {
    val seedBase =
      s"CASE WHEN s.node IS NOT NULL THEN (($scale * ${dampDen - dampNum}) // $dampDen) // sc.ns ELSE 0 END"
    val iters = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT nodes.node,
         |    $seedBase + (COALESCE(m.in_mass, 0) * $dampNum) // $dampDen AS rank
         |  FROM nodes CROSS JOIN sc
         |  LEFT JOIN seeds s ON s.node = nodes.node
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |           CAST(sum(r.rank * e.w // d.wsum) AS BIGINT) AS in_mass
         |    FROM r${i - 1} r JOIN e ON r.node = e.src JOIN deg d ON d.src = e.src
         |    GROUP BY 1) m ON m.node = nodes.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ui AS MATERIALIZED (
       |  SELECT user_id AS u,
       |         CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS i,
       |         count(*) AS n
       |  FROM events GROUP BY 1, 2
       |), capped AS MATERIALIZED (
       |  SELECT u, i FROM (
       |    SELECT u, i,
       |           row_number() OVER (PARTITION BY u ORDER BY n DESC, i) AS rk
       |    FROM ui)
       |  WHERE rk <= $maxItemsPerUser
       |), co AS MATERIALIZED (
       |  SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS n_users
       |  FROM capped a JOIN capped b ON a.u = b.u AND a.i < b.i
       |  GROUP BY 1, 2 HAVING count(*) >= $minUsers
       |), e AS MATERIALIZED (
       |  SELECT item_a AS src, item_b AS dst, n_users AS w FROM co
       |  UNION ALL SELECT item_b, item_a, n_users FROM co
       |), deg AS MATERIALIZED (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM e GROUP BY 1
       |), nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
       |), seeds AS MATERIALIZED (
       |  SELECT node FROM nodes ORDER BY node LIMIT $numSeeds
       |), sc AS (
       |  SELECT count(*) AS ns FROM seeds
       |), r0 AS (
       |  SELECT nodes.node,
       |    CASE WHEN s.node IS NOT NULL THEN $scale // sc.ns ELSE 0 END AS rank
       |  FROM nodes CROSS JOIN sc LEFT JOIN seeds s ON s.node = nodes.node
       |), $iters
       |SELECT node, rank FROM r$iterations""".stripMargin
  }

  // ---- q190: personalized PageRank — the q93 unroll with the base
  // restricted to the seed set (CASE on the seed flag) and the
  // seed-concentrated start; integers throughout, zero tolerance.
  def q190Sql(iterations: Int = 5, scale: Long = 1000000000000L,
              dampNum: Long = 85, dampDen: Long = 100,
              maxSeedPart: Int = 5): String = {
    val seedBase =
      s"CASE WHEN s.node IS NOT NULL THEN (($scale * ${dampDen - dampNum}) // $dampDen) // sc.ns ELSE 0 END"
    val iters = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT nodes.node,
         |    $seedBase + (COALESCE(m.in_mass, 0) * $dampNum) // $dampDen AS rank
         |  FROM nodes CROSS JOIN sc
         |  LEFT JOIN seeds s ON s.node = nodes.node
         |  LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS in_mass
         |    FROM r${i - 1} r JOIN e ON r.node = e.src JOIN deg d ON d.src = e.src
         |    GROUP BY 1) m ON m.node = nodes.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT 'p' || CAST(l_partkey AS VARCHAR) AS p,
       |         's' || CAST(l_suppkey AS VARCHAR) AS s
       |  FROM lineitem
       |), e AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT p AS src, s AS dst FROM pairs
       |    UNION ALL SELECT s AS src, p AS dst FROM pairs)
       |), deg AS (
       |  SELECT src, count(*) AS outdeg FROM e GROUP BY 1
       |), nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
       |), seeds AS (
       |  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS node
       |  FROM lineitem WHERE l_partkey <= $maxSeedPart
       |), sc AS (
       |  SELECT count(*) AS ns FROM seeds
       |), r0 AS (
       |  SELECT nodes.node,
       |    CASE WHEN s.node IS NOT NULL THEN $scale // sc.ns ELSE 0 END AS rank
       |  FROM nodes CROSS JOIN sc LEFT JOIN seeds s ON s.node = nodes.node
       |), $iters
       |SELECT node, rank FROM r$iterations""".stripMargin
  }

  // ---- q94/q95: fixed-point k-means — every Lloyd round unrolled as
  // plain CTEs. All arithmetic integer (scaled-long coords, exact long
  // sums, truncating // division — toward-zero in BOTH engines), argmin
  // ties break ORDER BY dist, cid — so assignments replay with no
  // tolerance. `kmeansCtes` emits the shared chain ending in an `asg`
  // CTE (vec_id → final cluster) that q94 selects directly and q95
  // builds the SemDeDup pair pass on.
  // k arrives as a SQL expression (`kSql`) because the chain is fully
  // relational in k — it appears only in the init LIMIT — which lets the
  // gate derive k from the corpus size exactly as the Spark side does
  // (KMeans.kForTargetClusterSize): ceil(count/target) clamped to maxK.
  private def kmeansCtes(kSql: String, iterations: Int, scale: Long,
                         dim: Int, sfx: String = "",
                         vecExpr: String = "embedding",
                         srcTable: String = "embeddings"): String = {
    def assignFrom(c: String) =
      s"""SELECT vec_id, x, cid FROM (
         |  SELECT p.vec_id, p.x, c.cid,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |      list_sum([(p.x[i] - c.c[i]) * (p.x[i] - c.c[i])
         |                FOR i IN range(1, ${dim + 1})]), c.cid) AS rn
         |  FROM pts$sfx p CROSS JOIN $c c) t
         |WHERE rn = 1""".stripMargin
    val iters = (1 to iterations).map { i =>
      s"""a$i$sfx AS (
         |${assignFrom(s"c${i - 1}$sfx")}
         |), s$i$sfx AS (
         |  SELECT cid, t.dim AS dim, CAST(sum(x[t.dim]) AS BIGINT) AS sv,
         |         count(*) AS n
         |  FROM a$i$sfx CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS dim) t
         |  GROUP BY 1, 2
         |), c$i$sfx AS (
         |  SELECT prev.cid, COALESCE(m.c, prev.c) AS c
         |  FROM c${i - 1}$sfx prev LEFT JOIN (
         |    SELECT cid, list(sv // n ORDER BY dim) AS c FROM s$i$sfx
         |    GROUP BY cid) m USING (cid)
         |)""".stripMargin
    }.mkString(", ")
    s"""pts$sfx AS (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(x AS DOUBLE) * $scale.0) AS BIGINT)
       |     FOR x IN $vecExpr] AS x
       |  FROM $srcTable
       |), c0$sfx AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
       |         x AS c
       |  FROM (SELECT vec_id, x FROM pts$sfx ORDER BY vec_id LIMIT $kSql) s
       |), $iters, asg$sfx AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |${assignFrom(s"c$iterations$sfx")}
       |) fin
       |)""".stripMargin
  }

  /** Derived-k SQL: the same ceil(n/target) ∧ maxK clamp as
    * KMeans.kForTargetClusterSize (DuckDB allows a scalar subquery as
    * LIMIT). The IEEE quotient argument for ceil-parity is at the Spark
    * helper's scaladoc.
    */
  private def derivedKSql(targetClusterSize: Long, maxK: Int): String =
    s"(SELECT least(CAST(ceil(count(*) / $targetClusterSize.0) AS BIGINT), $maxK) " +
      "FROM embeddings)"

  def q94Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
             iterations: Int = 5, scale: Long = 1000000L,
             dim: Int = 64): String =
    s"""WITH ${kmeansCtes(derivedKSql(targetClusterSize, maxK), iterations, scale, dim)}
       |SELECT vec_id, cluster FROM asg""".stripMargin

  // ---- q95: SemDeDup — within-cluster cosine pairs only, with k DERIVED
  // from the corpus size (ceil(n/target)) so the pair space Σ n_c² stays
  // ≈ n · targetClusterSize — linear in the corpus — instead of n²/k at
  // fixed k. A point is dropped when a LOWER-id same-cluster point has
  // rounded cosine ≥ tau. Cosine arithmetic is the q29 parity shape:
  // DOUBLE[] dot products fold in array order.
  def q95Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
             iterations: Int = 5, scale: Long = 1000000L,
             dim: Int = 64, tau: Double = 0.3): String =
    s"""WITH ${kmeansCtes(derivedKSql(targetClusterSize, maxK), iterations, scale, dim)}, ev AS (
       |  SELECT a.vec_id, a.cluster, e.embedding::DOUBLE[] AS v
       |  FROM asg a JOIN embeddings e USING (vec_id)
       |), dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM ev a JOIN ev b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE round(list_dot_product(a.v, b.v)
       |    / (sqrt(list_dot_product(a.v, a.v))
       |       * sqrt(list_dot_product(b.v, b.v))), 6) >= $tau
       |)
       |SELECT e.vec_id, e.cluster, d.vec_id IS NULL AS kept
       |FROM ev e LEFT JOIN dropped d ON e.vec_id = d.vec_id""".stripMargin

  // ---- q228: cluster-local k-NN graph — q95's pair space (within-cell
  // cosines over the bit-exact Lloyd chain, round-6 guarded) ranked into
  // a per-point top-k with a neighbor-id tiebreak, so the cut is total
  // and replays exactly.
  /** Shared chain: the q94 Lloyd cells, the `ev` vector view, and the
    * cluster-local top-k neighbor table `knn` (MATERIALIZED — the walk
    * oracle probes it once per hop).
    */
  private def knnChain(targetClusterSize: Long, maxK: Int, iterations: Int,
                       scale: Long, dim: Int, k: Int): String =
    s"""${kmeansCtes(derivedKSql(targetClusterSize, maxK), iterations, scale, dim)}, ev AS (
       |  SELECT a.vec_id, a.cluster, e.embedding::DOUBLE[] AS v
       |  FROM asg a JOIN embeddings e USING (vec_id)
       |), pr AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |    round(list_dot_product(a.v, b.v)
       |      / (sqrt(list_dot_product(a.v, a.v))
       |         * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
       |  FROM ev a JOIN ev b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
       |), knn AS MATERIALIZED (
       |  SELECT vec_id, knn_rank, neighbor_id, cos_sim FROM (
       |    SELECT vec_id, neighbor_id, cos_sim,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY cos_sim DESC, neighbor_id) AS knn_rank
       |    FROM pr WHERE cos_sim IS NOT NULL) t
       |  WHERE knn_rank <= $k
       |)""".stripMargin

  def q228Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, k: Int = 5): String =
    s"""WITH ${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}
       |SELECT vec_id, knn_rank, neighbor_id, cos_sim FROM knn""".stripMargin

  // ---- q234: reciprocal k-NN pairs — the knn chain self-joined on
  // swapped keys, one row per mutual pair with id_a < id_b.
  def q234Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, k: Int = 5): String =
    s"""WITH ${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}
       |SELECT a.vec_id AS id_a, a.neighbor_id AS id_b, a.cos_sim
       |FROM knn a JOIN knn b
       |  ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
       |WHERE a.vec_id < a.neighbor_id""".stripMargin

  // ---- q263/q264: deterministic random walks over the knn chain —
  // step CTEs MATERIALIZED (the unrolled-iteration discipline), next
  // hop = rank 1 + h(node, start, step) mod degree, dead ends truncate
  // by inner join. All arithmetic in exact BIGINTs.
  private def walkCtes(steps: Int, targetClusterSize: Long, maxK: Int,
                       iterations: Int, scale: Long, dim: Int,
                       k: Int): String = {
    val hops = (1 to steps).map { s =>
      s"""w$s AS MATERIALIZED (
         |  SELECT w.start_id, CAST($s AS BIGINT) AS step, g.neighbor_id AS node_id
         |  FROM w${s - 1} w
         |  JOIN deg ON w.node_id = deg.vec_id
         |  JOIN knn g ON g.vec_id = w.node_id
         |   AND g.knn_rank = 1 + (w.node_id * 2654435761 + w.start_id * 69069
         |                         + $s * 40503) % deg.d
         |)""".stripMargin
    }.mkString(", ")
    s"""${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}, deg AS MATERIALIZED (
       |  SELECT vec_id, CAST(count(*) AS BIGINT) AS d FROM knn GROUP BY 1
       |), w0 AS MATERIALIZED (
       |  SELECT vec_id AS start_id, CAST(0 AS BIGINT) AS step,
       |    vec_id AS node_id FROM deg
       |), $hops, wall AS (
       |  ${(0 to steps).map(s => s"SELECT start_id, step, node_id FROM w$s")
            .mkString("\n  UNION ALL ")}
       |)""".stripMargin
  }

  def q263Sql(steps: Int = 8, targetClusterSize: Long = 2500L,
              maxK: Int = 4096, iterations: Int = 5,
              scale: Long = 1000000L, dim: Int = 64, k: Int = 5): String =
    s"""WITH ${walkCtes(steps, targetClusterSize, maxK, iterations, scale, dim, k)}
       |SELECT start_id, step, node_id FROM wall""".stripMargin

  def q264Sql(steps: Int = 8, window: Int = 2,
              targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L, dim: Int = 64,
              k: Int = 5): String =
    s"""WITH ${walkCtes(steps, targetClusterSize, maxK, iterations, scale, dim, k)}
       |SELECT a.node_id AS src_type, b.node_id AS dst_type,
       |  CAST(b.step - a.step AS BIGINT) AS gap, count(*) AS n_pairs
       |FROM wall a JOIN wall b
       |  ON a.start_id = b.start_id AND b.step > a.step
       | AND b.step <= a.step + $window
       |GROUP BY 1, 2, 3""".stripMargin

  // ---- q235: semantic clusters — the mutual pairs closed with a
  // recursive CTE (exact components, the q98 discipline), singletons
  // clustering as themselves.
  def q235Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, k: Int = 5): String =
    s"""WITH RECURSIVE ${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}, mp AS (
       |  SELECT a.vec_id AS a, a.neighbor_id AS b
       |  FROM knn a JOIN knn b
       |    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
       |), reach AS (
       |  SELECT a, b FROM mp
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN mp e2 ON r.b = e2.a
       |), lbl AS (
       |  SELECT a AS vec_id, least(a, min(b)) AS cluster
       |  FROM reach GROUP BY a
       |)
       |SELECT e.vec_id, COALESCE(l.cluster, e.vec_id) AS cluster,
       |  e.vec_id = COALESCE(l.cluster, e.vec_id) AS is_rep
       |FROM embeddings e LEFT JOIN lbl l ON e.vec_id = l.vec_id""".stripMargin

  // ---- q236: DBSCAN over the within-cell ε-relation — the Lloyd chain
  // (target 250: the cell bound is live at gate scale), the ε-pair frame
  // (round-6 cosine ≥ eps, MATERIALIZED — it feeds the degree count, the
  // core-core edges, and the border assignment), core = ≥ minPts
  // neighbors (self excluded), clusters = recursive closure over
  // core-core edges labeled by the component minimum, border = min
  // adjacent core label (the operator's deterministic rule), noise =
  // null cluster.
  def q236Sql(targetClusterSize: Long = 250L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, eps: Double = 0.35, minPts: Int = 2): String =
    s"""WITH RECURSIVE ${kmeansCtes(derivedKSql(targetClusterSize, maxK), iterations, scale, dim)}, ev AS (
       |  SELECT a.vec_id, a.cluster, e.embedding::DOUBLE[] AS v
       |  FROM asg a JOIN embeddings e USING (vec_id)
       |), pe AS MATERIALIZED (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib
       |  FROM ev a JOIN ev b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
       |  WHERE round(list_dot_product(a.v, b.v)
       |    / (sqrt(list_dot_product(a.v, a.v))
       |       * sqrt(list_dot_product(b.v, b.v))), 6) >= $eps
       |), corex AS MATERIALIZED (
       |  SELECT ia AS vec_id FROM pe GROUP BY ia HAVING count(*) >= $minPts
       |), ce AS MATERIALIZED (
       |  SELECT p.ia AS a, p.ib AS b FROM pe p
       |  JOIN corex c1 ON p.ia = c1.vec_id
       |  JOIN corex c2 ON p.ib = c2.vec_id
       |), reach AS (
       |  SELECT a, b FROM ce
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN ce e2 ON r.b = e2.a
       |), lbl AS MATERIALIZED (
       |  SELECT c.vec_id, least(c.vec_id, COALESCE(m.mb, c.vec_id)) AS cl
       |  FROM corex c LEFT JOIN (
       |    SELECT a, min(b) AS mb FROM reach GROUP BY a) m
       |    ON c.vec_id = m.a
       |), brd AS MATERIALIZED (
       |  SELECT p.ia AS vec_id, min(l.cl) AS cl
       |  FROM pe p JOIN lbl l ON p.ib = l.vec_id
       |  WHERE p.ia NOT IN (SELECT vec_id FROM corex)
       |  GROUP BY p.ia
       |)
       |SELECT e.vec_id,
       |  CASE WHEN l.vec_id IS NOT NULL THEN 'core'
       |       WHEN b.vec_id IS NOT NULL THEN 'border'
       |       ELSE 'noise' END AS point_type,
       |  COALESCE(l.cl, b.cl) AS cluster
       |FROM embeddings e
       |LEFT JOIN lbl l ON e.vec_id = l.vec_id
       |LEFT JOIN brd b ON e.vec_id = b.vec_id""".stripMargin

  // ---- q243: neighbor-vote label audit — the knn chain + per-point
  // neighbor-label counts + the (count DESC, label ASC) argmax; suspect
  // is null (not false) for points with no neighbors to vote.
  def q243Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, k: Int = 5): String =
    s"""WITH ${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}, lv AS (
       |  SELECT kk.vec_id, e.label AS l
       |  FROM knn kk JOIN embeddings e ON kk.neighbor_id = e.vec_id
       |), votes AS (
       |  SELECT vec_id, l, count(*) AS n FROM lv GROUP BY vec_id, l
       |), top AS (
       |  SELECT vec_id, l AS voted_label, n AS n_votes FROM (
       |    SELECT vec_id, l, n,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY n DESC, l) AS rn
       |    FROM votes) t
       |  WHERE rn = 1
       |)
       |SELECT e.vec_id, e.label AS own_label, t.voted_label, t.n_votes,
       |  CASE WHEN t.voted_label IS NULL THEN NULL
       |       ELSE t.voted_label <> e.label END AS suspect
       |FROM embeddings e LEFT JOIN top t ON e.vec_id = t.vec_id""".stripMargin

  // ---- q239: ANN recall@k report — the q19 brute CTE and the q24 LSH
  // CTE (coarser geometry so the report has spread), joined into
  // per-query hit counts; recall in exact basis points ⌊10⁴·hits/k⌋;
  // zero-overlap queries report 0 via the left join.
  def q239Sql(k: Int = 5, nPlanes: Int = 4, probeBits: Int = 2,
              dim: Int = 64, seed: Long = 42L, nQueries: Int = 50): String = {
    val planes = VectorFunctions.seededPlanes(nPlanes, dim, seed)
    val probeXors = (0L +: (0 until probeBits).map(i => 1L << i))
      .mkString("[", ", ", "]")
    s"""WITH qd AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
       |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS qn,
       |    ${bucketSql("embedding::DOUBLE[]", planes)} AS bucket0
       |  FROM embeddings WHERE vec_id < $nQueries
       |), c AS (
       |  SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv,
       |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS cn,
       |    ${bucketSql("embedding::DOUBLE[]", planes)} AS bucket
       |  FROM embeddings
       |), br AS MATERIALIZED (
       |  SELECT query_id, cand_id FROM (
       |    SELECT q.query_id, c.cand_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_dot_product(q.qv, c.cv)
       |          / (sqrt(q.qn) * sqrt(c.cn)), 6) DESC, c.cand_id) AS rn
       |    FROM qd q CROSS JOIN c WHERE q.query_id <> c.cand_id) t
       |  WHERE rn <= $k
       |), probes AS (
       |  SELECT DISTINCT query_id, qv, qn, xor(bucket0, p) AS bucket
       |  FROM qd, (SELECT unnest($probeXors) AS p)
       |), ap AS MATERIALIZED (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos_sim DESC, cand_id) AS rn
       |    FROM (
       |      SELECT DISTINCT p.query_id, c.cand_id,
       |        round(list_dot_product(p.qv, c.cv)
       |          / (sqrt(p.qn) * sqrt(c.cn)), 6) AS cos_sim
       |      FROM c JOIN probes p USING (bucket)
       |      WHERE p.query_id <> c.cand_id) s) t
       |  WHERE rn <= $k
       |), hits AS (
       |  SELECT b.query_id, count(*) AS n_hits
       |  FROM br b JOIN ap a
       |    ON b.query_id = a.query_id AND b.cand_id = a.cand_id
       |  GROUP BY b.query_id
       |)
       |SELECT q.query_id, COALESCE(h.n_hits, 0) AS n_hits,
       |  COALESCE(h.n_hits, 0) * 10000 // $k AS recall_bp
       |FROM (SELECT DISTINCT query_id FROM br) q
       |LEFT JOIN hits h ON q.query_id = h.query_id""".stripMargin
  }

  /** The weighted mutual-pair edge CTE shared by the MST oracles:
    * q234's mutual join with w = 10⁶ − round(cos·10⁶) (cos is round-6,
    * so the product sits within 1e-9 of an integer — no half-tie).
    * Canonical u < v; the mutual join emits each pair once, so no
    * parallel-edge collapse is needed (GROUP BY kept anyway to mirror
    * the operator's collapse step bit-for-bit).
    */
  private def mutualWeightedCte: String =
    s"""eg AS MATERIALIZED (
       |  SELECT u, v, min(w) AS w FROM (
       |    SELECT a.vec_id AS u, a.neighbor_id AS v,
       |      1000000 - CAST(round(a.cos_sim * 1000000) AS BIGINT) AS w
       |    FROM knn a JOIN knn b
       |      ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
       |    WHERE a.vec_id < a.neighbor_id) t
       |  GROUP BY u, v
       |)""".stripMargin

  // ---- q237: Borůvka unrolled — per round: closure over the forest-
  // so-far labels every node (lbl0 = self), each edge annotates with
  // both endpoint components, each component's minimum CROSS edge by
  // the strict (w, u, v) total order is selected (row_number, the
  // total cut), and the selected set unions into the forest (UNION ALL
  // — selections are cross-component, forest edges intra-component, so
  // the sets are disjoint by construction; mirroring the operator's
  // plain union keeps even a hypothetical overlap bit-identical).
  // Every round CTE is MATERIALIZED (the q185 re-expansion lesson).
  def q237Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, k: Int = 5, rounds: Int = 3): String =
    s"""WITH RECURSIVE ${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}, $mutualWeightedCte, mnodes AS (
       |  SELECT u AS node FROM eg UNION SELECT v FROM eg
       |), ${mstRoundCtes(rounds)}
       |SELECT u, v, w FROM f$rounds""".stripMargin

  /** The Borůvka round CTE chain (f1..fN) shared by q237 and q259. */
  private def mstRoundCtes(rounds: Int): String = {
    (1 to rounds).map { r =>
      val lblPrev =
        if (r == 1)
          s"""lbl0 AS (SELECT node, node AS comp FROM mnodes)"""
        else
          s"""dir${r - 1} AS (
             |  SELECT u AS a, v AS b FROM f${r - 1}
             |  UNION ALL SELECT v, u FROM f${r - 1}
             |), rc${r - 1} AS (
             |  SELECT a, b FROM dir${r - 1}
             |  UNION
             |  SELECT rc${r - 1}.a, d.b
             |  FROM rc${r - 1} JOIN dir${r - 1} d ON rc${r - 1}.b = d.a
             |), lbl${r - 1} AS MATERIALIZED (
             |  SELECT n.node,
             |    least(n.node, COALESCE(m.mb, n.node)) AS comp
             |  FROM mnodes n LEFT JOIN (
             |    SELECT a, min(b) AS mb FROM rc${r - 1} GROUP BY a) m
             |    ON n.node = m.a
             |)""".stripMargin
      val prevForest = if (r == 1) "" else s"SELECT u, v, w FROM f${r - 1} UNION ALL "
      s"""$lblPrev, sel$r AS MATERIALIZED (
         |  SELECT DISTINCT u, v, w FROM (
         |    SELECT cc, u, v, w,
         |      row_number() OVER (PARTITION BY cc ORDER BY w, u, v) AS rn
         |    FROM (
         |      SELECT la.comp AS cc, e.u, e.v, e.w
         |      FROM eg e JOIN lbl${r - 1} la ON e.u = la.node
         |      JOIN lbl${r - 1} lb ON e.v = lb.node
         |      WHERE la.comp <> lb.comp
         |      UNION ALL
         |      SELECT lb.comp AS cc, e.u, e.v, e.w
         |      FROM eg e JOIN lbl${r - 1} la ON e.u = la.node
         |      JOIN lbl${r - 1} lb ON e.v = lb.node
         |      WHERE la.comp <> lb.comp) c) t
         |  WHERE rn = 1
         |), f$r AS MATERIALIZED (
         |  ${prevForest}SELECT u, v, w FROM sel$r
         |)""".stripMargin
    }.mkString(", ")
  }

  // ---- q259: dendrogram cut by COUNT — drop the `cuts` heaviest forest
  // edges by the (w DESC, u, v) total order, closure over the KEPT
  // forest edges (node-bounded — the forest, not the pair space),
  // min-reachable labels, embeddings left-joined so isolated vectors
  // cluster as themselves (the q238 label shape). UNLIKE q237 (whose
  // engine side is the 3-round-capped boruvka), the cut runs on the
  // FIXPOINT forest — 3 rounds leave late merges out (measured: 493 vs
  // 497 edges at sf0.001, fixpoint at round 5 at sf0.001 AND sf0.01) —
  // so this oracle unrolls 8 rounds; rounds past the fixpoint select
  // nothing and are harmless, and a scale where 8 is insufficient fails
  // the gate loudly rather than silently.
  def q259Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, k: Int = 5, rounds: Int = 8,
              cuts: Int = 10): String =
    s"""WITH RECURSIVE ${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}, $mutualWeightedCte, mnodes AS (
       |  SELECT u AS node FROM eg UNION SELECT v FROM eg
       |), ${mstRoundCtes(rounds)}, rankedf AS MATERIALIZED (
       |  SELECT u, v, w,
       |    row_number() OVER (ORDER BY w DESC, u, v) AS rk
       |  FROM f$rounds
       |), keptf AS (
       |  SELECT u, v FROM rankedf WHERE rk > $cuts
       |), dirk AS (
       |  SELECT u AS a, v AS b FROM keptf
       |  UNION ALL SELECT v, u FROM keptf
       |), reachk AS (
       |  SELECT a, b FROM dirk
       |  UNION
       |  SELECT reachk.a, d.b FROM reachk JOIN dirk d ON reachk.b = d.a
       |), lblk AS (
       |  SELECT a AS vec_id, least(a, min(b)) AS cluster
       |  FROM reachk GROUP BY a
       |)
       |SELECT e.vec_id, COALESCE(l.cluster, e.vec_id) AS cluster
       |FROM embeddings e LEFT JOIN lblk l ON e.vec_id = l.vec_id""".stripMargin

  // ---- q238: single-linkage flat clusters at wmax — the DEFINITION
  // (closure over ALL mutual pairs with w <= wmax); the Spark side
  // serves the identical labeling from the persisted fixpoint MSF's
  // <= wmax cut, so the gate proves the cut property end-to-end.
  def q238Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, k: Int = 5, wmax: Long = 620000L): String =
    s"""WITH RECURSIVE ${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}, $mutualWeightedCte, cutd AS (
       |  SELECT u AS a, v AS b FROM eg WHERE w <= $wmax
       |  UNION ALL SELECT v, u FROM eg WHERE w <= $wmax
       |), reach AS (
       |  SELECT a, b FROM cutd
       |  UNION
       |  SELECT reach.a, d.b FROM reach JOIN cutd d ON reach.b = d.a
       |), lbl AS (
       |  SELECT a AS vec_id, least(a, min(b)) AS cluster
       |  FROM reach GROUP BY a
       |)
       |SELECT e.vec_id, COALESCE(l.cluster, e.vec_id) AS cluster
       |FROM embeddings e LEFT JOIN lbl l ON e.vec_id = l.vec_id""".stripMargin

  // ---- q233: greedy graph-descent over the q228 k-NN graph — hops
  // unrolled: each hop argmaxes round-6 cosine over {current} ∪
  // {neighbors} with a candidate-id tiebreak. Every hop CTE is
  // MATERIALIZED (g(r-1) feeds both union branches).
  def q233Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, k: Int = 5,
              nQueries: Int = 4, hops: Int = 4): String = {
    def cosSql(a: String, b: String) =
      s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) " +
        s"* sqrt(list_dot_product($b, $b))), 6)"
    val hopCtes = (1 to hops).map { r =>
      s"""g$r AS MATERIALIZED (
         |  SELECT qid, cur, sim FROM (
         |    SELECT t.qid, t.cand AS cur, t.s AS sim,
         |      row_number() OVER (PARTITION BY t.qid
         |        ORDER BY t.s DESC, t.cand) AS rn
         |    FROM (
         |      SELECT g.qid, g.cur AS cand, g.sim AS s FROM g${r - 1} g
         |      UNION ALL
         |      SELECT g.qid, kk.neighbor_id AS cand,
         |        ${cosSql("q.qv", "ev2.v")} AS s
         |      FROM g${r - 1} g
         |      JOIN knn kk ON kk.vec_id = g.cur
         |      JOIN ev ev2 ON ev2.vec_id = kk.neighbor_id
         |      JOIN qs q ON q.qid = g.qid
         |    ) t) u WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")
    val unions = (1 to hops).map(r =>
      s"UNION ALL SELECT qid, CAST($r AS BIGINT), cur, sim FROM g$r")
      .mkString("\n")
    s"""WITH ${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}, qs AS (
       |  SELECT vec_id AS qid, v AS qv FROM ev ORDER BY vec_id LIMIT $nQueries
       |), entry AS (
       |  SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT 1
       |), g0 AS MATERIALIZED (
       |  SELECT q.qid, e.vec_id AS cur, ${cosSql("q.qv", "e.v")} AS sim
       |  FROM qs q CROSS JOIN entry e
       |), $hopCtes
       |SELECT qid AS query_id, CAST(0 AS BIGINT) AS hop, cur AS vec_id, sim
       |FROM g0
       |$unions""".stripMargin
  }

  // ---- q245: beam-width (efSearch) walk over the q228 graph — the
  // q233 unroll with a top-`beam` frontier per hop: the candidate
  // union is DISTINCT (state ∪ neighbors-of-state — a shared neighbor
  // must not occupy two beam slots; sims are round-6 replays of the
  // same expression, so the dedup is exact), and the per-hop cut keeps
  // rank <= beam instead of = 1. Every hop CTE MATERIALIZED.
  def q245Sql(targetClusterSize: Long = 2500L, maxK: Int = 4096,
              iterations: Int = 5, scale: Long = 1000000L,
              dim: Int = 64, k: Int = 5,
              nQueries: Int = 4, hops: Int = 3, beam: Int = 2): String = {
    def cosSql(a: String, b: String) =
      s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) " +
        s"* sqrt(list_dot_product($b, $b))), 6)"
    val hopCtes = (1 to hops).map { r =>
      s"""g$r AS MATERIALIZED (
         |  SELECT qid, cur, sim, rn AS rnk FROM (
         |    SELECT t.qid, t.cand AS cur, t.s AS sim,
         |      row_number() OVER (PARTITION BY t.qid
         |        ORDER BY t.s DESC, t.cand) AS rn
         |    FROM (
         |      SELECT DISTINCT qid, cand, s FROM (
         |        SELECT g.qid, g.cur AS cand, g.sim AS s FROM g${r - 1} g
         |        UNION ALL
         |        SELECT g.qid, kk.neighbor_id AS cand,
         |          ${cosSql("q.qv", "ev2.v")} AS s
         |        FROM g${r - 1} g
         |        JOIN knn kk ON kk.vec_id = g.cur
         |        JOIN ev ev2 ON ev2.vec_id = kk.neighbor_id
         |        JOIN qs q ON q.qid = g.qid
         |      ) raw
         |    ) t) u WHERE rn <= $beam
         |)""".stripMargin
    }.mkString(", ")
    val unions = (1 to hops).map(r =>
      s"""UNION ALL SELECT qid, CAST($r AS BIGINT), CAST(rnk AS BIGINT),
         |cur, sim FROM g$r""".stripMargin)
      .mkString("\n")
    s"""WITH ${knnChain(targetClusterSize, maxK, iterations, scale, dim, k)}, qs AS (
       |  SELECT vec_id AS qid, v AS qv FROM ev ORDER BY vec_id LIMIT $nQueries
       |), entry AS (
       |  SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT 1
       |), g0 AS MATERIALIZED (
       |  SELECT q.qid, e.vec_id AS cur, ${cosSql("q.qv", "e.v")} AS sim,
       |    1 AS rnk
       |  FROM qs q CROSS JOIN entry e
       |), $hopCtes
       |SELECT qid AS query_id, CAST(0 AS BIGINT) AS hop,
       |  CAST(1 AS BIGINT) AS beam_rank, cur AS vec_id, sim
       |FROM g0
       |$unions""".stripMargin
  }

  // ---- q229: greedy k-center (Gonzalez) unrolled — the same scaled-long
  // points as the Lloyd chain, exact BIGINT squared distances, argmax
  // with an id tiebreak per round. Each d-frame CTE is MATERIALIZED:
  // d(r-1) feeds both sel(r) and d(r), and without the barrier DuckDB's
  // inlining re-expands the chain exponentially (the q185 lesson).
  private def kcenterDistSql(dim: Int, p: String, s: String): String =
    s"CAST(list_sum([($p.x[i] - $s.x[i]) * ($p.x[i] - $s.x[i]) " +
      s"FOR i IN range(1, ${dim + 1})]) AS BIGINT)"

  /** The shared greedy-k-center chain: pts, sel1..selm, d1..d(m-1). */
  private def kcenterCtes(m: Int, scale: Long, dim: Int): String = {
    val rounds = (2 to m).map { r =>
      val sel =
        s"""sel$r AS (
           |  SELECT vec_id, x, d FROM d${r - 1} ORDER BY d DESC, vec_id LIMIT 1
           |)""".stripMargin
      if (r == m) sel
      else
        sel + s""", d$r AS MATERIALIZED (
           |  SELECT p.vec_id, p.x, least(p.d, ${kcenterDistSql(dim, "p", "s")}) AS d
           |  FROM d${r - 1} p CROSS JOIN sel$r s
           |)""".stripMargin
    }.mkString(", ")
    s"""pts AS (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(x AS DOUBLE) * $scale.0) AS BIGINT)
       |     FOR x IN embedding] AS x
       |  FROM embeddings
       |), sel1 AS (
       |  SELECT vec_id, x FROM pts ORDER BY vec_id LIMIT 1
       |), d1 AS MATERIALIZED (
       |  SELECT p.vec_id, p.x, ${kcenterDistSql(dim, "p", "s")} AS d
       |  FROM pts p CROSS JOIN sel1 s
       |), $rounds""".stripMargin
  }

  def q229Sql(m: Int = 8, scale: Long = 1000000L, dim: Int = 64): String = {
    val unions = (2 to m).map(r =>
      s"UNION ALL SELECT CAST($r AS BIGINT), vec_id, d FROM sel$r")
      .mkString("\n")
    s"""WITH ${kcenterCtes(m, scale, dim)}
       |SELECT CAST(1 AS BIGINT) AS sel_round, vec_id,
       |       CAST(NULL AS BIGINT) AS min_dist_sq
       |FROM sel1
       |$unions""".stripMargin
  }

  // ---- q231: nearest-center assignment over the q229 draw — the same
  // unrolled chain, then one argmin per point over the m centers
  // (exact BIGINT distances, lowest-center-id tiebreak).
  def q231Sql(m: Int = 8, scale: Long = 1000000L, dim: Int = 64): String = {
    val centerUnion = (2 to m)
      .map(r => s"UNION ALL SELECT vec_id, x FROM sel$r")
      .mkString("\n")
    s"""WITH ${kcenterCtes(m, scale, dim)}, centers AS (
       |  SELECT vec_id, x FROM sel1
       |$centerUnion
       |)
       |SELECT vec_id, center_id, dist_sq FROM (
       |  SELECT p.vec_id, c.vec_id AS center_id,
       |    ${kcenterDistSql(dim, "p", "c")} AS dist_sq,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |      ${kcenterDistSql(dim, "p", "c")}, c.vec_id) AS rn
       |  FROM pts p CROSS JOIN centers c) t
       |WHERE rn = 1""".stripMargin
  }

  // ---- q230: MMR re-rank unrolled — round-6 relevance and pair sims,
  // then nSel greedy rounds: maxsim over the selected set, the two-op
  // IEEE score (λ and 1−λ printed from the same Scala doubles the Spark
  // side multiplies by), argmax with a candidate-id tiebreak. The
  // growing selected-set union is MATERIALIZED per round — selu(r-1)
  // feeds three consumers, the exponential-inlining hazard again.
  def q230Sql(nQueries: Int = 4, nCand: Int = 20, nSel: Int = 10,
              lambda: Double = 0.7): String = {
    val lam = lambda.toString
    val oneMinus = (1.0 - lambda).toString
    def cosSql(a: String, b: String) =
      s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) " +
        s"* sqrt(list_dot_product($b, $b))), 6)"
    val rounds = (2 to nSel).map { r =>
      s"""m$r AS (
         |  SELECT s.qid, s.ca AS cid, max(s.sim) AS maxsim
         |  FROM s JOIN selu${r - 1} u ON s.qid = u.qid AND s.cb = u.cid
         |  GROUP BY 1, 2
         |), sc$r AS (
         |  SELECT c.qid, c.cid, c.rel,
         |    $lam * c.rel - $oneMinus * m.maxsim AS score
         |  FROM cand c JOIN m$r m ON c.qid = m.qid AND c.cid = m.cid
         |  WHERE NOT EXISTS (SELECT 1 FROM selu${r - 1} u
         |                    WHERE u.qid = c.qid AND u.cid = c.cid)
         |), sel$r AS (
         |  SELECT qid, cid, CAST($r AS BIGINT) AS mmr_rank, rel, score FROM (
         |    SELECT qid, cid, rel, score,
         |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
         |    FROM sc$r) t WHERE rn = 1
         |), selu$r AS MATERIALIZED (
         |  SELECT * FROM selu${r - 1} UNION ALL SELECT * FROM sel$r
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ev AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), q AS (
       |  SELECT vec_id AS qid, v AS qv FROM ev ORDER BY vec_id LIMIT $nQueries
       |), rel0 AS (
       |  SELECT q.qid, e.vec_id AS cid, e.v,
       |    ${cosSql("q.qv", "e.v")} AS rel
       |  FROM q JOIN ev e ON e.vec_id <> q.qid
       |), cand AS MATERIALIZED (
       |  SELECT qid, cid, v, rel FROM (
       |    SELECT qid, cid, v, rel,
       |      row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rn
       |    FROM rel0 WHERE rel IS NOT NULL) t
       |  WHERE rn <= $nCand
       |), s AS MATERIALIZED (
       |  SELECT a.qid, a.cid AS ca, b.cid AS cb, ${cosSql("a.v", "b.v")} AS sim
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
       |), sel1 AS (
       |  SELECT qid, cid, CAST(1 AS BIGINT) AS mmr_rank, rel,
       |         $lam * rel AS score
       |  FROM (
       |    SELECT qid, cid, rel,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY $lam * rel DESC, cid) AS rn
       |    FROM cand) t WHERE rn = 1
       |), selu1 AS (SELECT qid, cid, mmr_rank, rel, score FROM sel1), $rounds
       |SELECT qid AS query_id, mmr_rank, cid AS vec_id, rel, score
       |FROM selu$nSel""".stripMargin
  }

  // ---- q112: TWO-LEVEL fixed-point k-means — both levels unrolled as
  // plain CTEs. Level 1 reuses the q94 chain at k₁ = ⌈√k_total⌉ (IEEE
  // sqrt is correctly rounded, so both engines' ceil lands on the same
  // integer); level 2 runs an independent Lloyd INSIDE each coarse group:
  // init is the ⌈n_g/target⌉ lowest-id points per group, assignment
  // argmins only over same-group centroids (the p.g = c.g join), updates
  // group by (g, cid). All arithmetic stays integer, so the full
  // hierarchy replays with no tolerance.
  def q112Sql(targetClusterSize: Long = 25L, maxK: Int = 4096,
              iterations: Int = 3, scale: Long = 1000000L,
              dim: Int = 64): String = {
    val k1Sql =
      s"(SELECT CAST(ceil(sqrt(least(CAST(ceil(count(*) / $targetClusterSize.0) AS BIGINT), $maxK))) AS BIGINT) FROM embeddings)"
    def fineAssign(c: String) =
      s"""SELECT vec_id, g, x, cid FROM (
         |  SELECT p.vec_id, p.g, p.x, c.cid,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |      list_sum([(p.x[i] - c.c[i]) * (p.x[i] - c.c[i])
         |                FOR i IN range(1, ${dim + 1})]), c.cid) AS rn
         |  FROM p2 p JOIN $c c ON p.g = c.g) t
         |WHERE rn = 1""".stripMargin
    val fineIters = (1 to iterations).map { i =>
      s"""b$i AS (
         |${fineAssign(s"f${i - 1}")}
         |), u$i AS (
         |  SELECT g, cid, t.dim AS dim, CAST(sum(x[t.dim]) AS BIGINT) AS sv,
         |         count(*) AS n
         |  FROM b$i CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS dim) t
         |  GROUP BY 1, 2, 3
         |), f$i AS (
         |  SELECT prev.g, prev.cid, COALESCE(m.c, prev.c) AS c
         |  FROM f${i - 1} prev LEFT JOIN (
         |    SELECT g, cid, list(sv // n ORDER BY dim) AS c FROM u$i
         |    GROUP BY g, cid) m USING (g, cid)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${kmeansCtes(k1Sql, iterations, scale, dim)}, p2 AS (
       |  SELECT p.vec_id, p.x, a.cluster AS g FROM pts p JOIN asg a USING (vec_id)
       |), f0 AS (
       |  SELECT g, CAST(rn - 1 AS INTEGER) AS cid, x AS c FROM (
       |    SELECT g, x,
       |      row_number() OVER (PARTITION BY g ORDER BY vec_id) AS rn,
       |      count(*) OVER (PARTITION BY g) AS ng
       |    FROM p2) t
       |  WHERE rn <= least(CAST(ceil(ng / $targetClusterSize.0) AS BIGINT), $maxK)
       |), $fineIters
       |SELECT vec_id, g AS coarse, cid AS fine,
       |  CAST(g AS BIGINT) * $maxK + cid AS cluster
       |FROM (
       |${fineAssign(s"f$iterations")}
       |) fin""".stripMargin
  }

  // ---- q96: substring-level duplication stats — grams hash through the
  // portable md5-60 path, counts and the interval-union fold are all
  // integer, the covered fraction is one IEEE division: exact replay.
  // DuckDB list slices are 1-based-inclusive (ws[i : i+k-1] is k tokens,
  // matching Spark's slice(ts, i, k)); list comprehensions CAN correlate
  // with outer columns (unlike generate_series).
  def q96Sql(k: Int = 8, minCount: Long = 2L): String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws
       |  FROM documents
       |), n AS (
       |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_tokens FROM t
       |), g0 AS (
       |  SELECT doc_id,
       |    [{'s': CAST(i AS BIGINT),
       |      'gh': ${PortableHash.hash60Sql(
                 s"list_aggregate(ws[i : i + ${k - 1}], 'string_agg', chr(31))")}}
       |     FOR i IN range(1, CAST(greatest(n_tokens - ${k - 1} + 1, 1) AS INTEGER))] AS gs
       |  FROM n
       |), g AS (
       |  SELECT doc_id, u.s AS start, u.gh AS gh
       |  FROM (SELECT doc_id, unnest(gs) AS u FROM g0)
       |), c AS (
       |  SELECT gh FROM g GROUP BY gh HAVING count(*) >= $minCount
       |), d AS (
       |  SELECT doc_id, list_sort(list(start)) AS starts,
       |         count(*) AS n_dup_grams
       |  FROM g JOIN c USING (gh) GROUP BY doc_id
       |), cov AS (
       |  SELECT doc_id, n_dup_grams,
       |    $k + COALESCE(CAST(list_sum(
       |      [least($k, starts[i + 1] - starts[i])
       |       FOR i IN range(1, CAST(len(starts) AS INTEGER))]) AS BIGINT), 0) AS dup_tokens
       |  FROM d
       |)
       |SELECT n.doc_id, n.n_tokens,
       |  COALESCE(cov.n_dup_grams, 0) AS n_dup_grams,
       |  COALESCE(cov.dup_tokens, 0) AS dup_tokens,
       |  CASE WHEN n.n_tokens = 0 THEN 0.0
       |       ELSE CAST(COALESCE(cov.dup_tokens, 0) AS DOUBLE)
       |            / CAST(n.n_tokens AS DOUBLE) END AS dup_frac
       |FROM n LEFT JOIN cov ON n.doc_id = cov.doc_id""".stripMargin

  // ---- q102: the q96 chain's REMOVAL counterpart — token i survives iff
  // no duplicated-gram start s has s <= i < s + k; the kept tokens
  // re-render single-space joined, exactly the Spark two-pointer cut.
  def q102Sql(k: Int = 8, minCount: Long = 2L): String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws
       |  FROM documents
       |), n AS (
       |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_tokens FROM t
       |), g0 AS (
       |  SELECT doc_id,
       |    [{'s': CAST(i AS BIGINT),
       |      'gh': ${PortableHash.hash60Sql(
                 s"list_aggregate(ws[i : i + ${k - 1}], 'string_agg', chr(31))")}}
       |     FOR i IN range(1, CAST(greatest(n_tokens - ${k - 1} + 1, 1) AS INTEGER))] AS gs
       |  FROM n
       |), g AS (
       |  SELECT doc_id, u.s AS start, u.gh AS gh
       |  FROM (SELECT doc_id, unnest(gs) AS u FROM g0)
       |), c AS (
       |  SELECT gh FROM g GROUP BY gh HAVING count(*) >= $minCount
       |), d AS (
       |  SELECT doc_id, list_sort(list(start)) AS starts
       |  FROM g JOIN c USING (gh) GROUP BY doc_id
       |), kept AS (
       |  SELECT n.doc_id, n.n_tokens,
       |    [n.ws[i] FOR i IN range(1, CAST(n.n_tokens AS INTEGER) + 1)
       |     IF len(list_filter(COALESCE(d.starts, CAST([] AS BIGINT[])),
       |            s -> s <= i AND i < s + $k)) = 0] AS ks
       |  FROM n LEFT JOIN d ON n.doc_id = d.doc_id
       |)
       |SELECT doc_id, n_tokens, CAST(len(ks) AS BIGINT) AS n_kept,
       |  COALESCE(list_aggregate(ks, 'string_agg', ' '), '') AS clean_text
       |FROM kept""".stripMargin

  // ---- q103: cross-source contamination matrix — distinct (source, gh)
  // pairs self-join per gram (equivalent to the engine's bounded
  // pair expansion: both count distinct shared ghs per ordered source
  // pair, both exclude grams in more than `cap` sources).
  def q103Sql(k: Int = 8, cap: Int = 64): String =
    s"""WITH t AS (
       |  SELECT source, regexp_extract_all(text, '\\S+') AS ws
       |  FROM documents
       |), n AS (
       |  SELECT source, ws, CAST(len(ws) AS BIGINT) AS n_tokens FROM t
       |  WHERE len(ws) >= $k
       |), g0 AS (
       |  SELECT source,
       |    [${PortableHash.hash60Sql(
              s"list_aggregate(ws[i : i + ${k - 1}], 'string_agg', chr(31))")}
       |     FOR i IN range(1, CAST(n_tokens - ${k - 1} + 1 AS INTEGER))] AS gs
       |  FROM n
       |), g AS (
       |  SELECT DISTINCT source, unnest(gs) AS gh FROM g0
       |), cnt AS (
       |  SELECT gh FROM g GROUP BY gh
       |  HAVING count(*) BETWEEN 2 AND $cap
       |)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(count(*) AS BIGINT) AS shared_grams
       |FROM g a
       |JOIN g b ON a.gh = b.gh AND a.source < b.source
       |JOIN cnt ON cnt.gh = a.gh
       |GROUP BY 1, 2""".stripMargin

  // ---- q107: budgeted corpus assembly — per-source budgets come from
  // THE SAME Sampling.budgetsFor call the Spark plan uses, embedded as
  // literals; the window replays the salted-hash draw + inclusive
  // running cost.
  def q107Sql(weights: Seq[(String, Double)], totalBudget: Long,
              salt: String = "mix"): String = {
    val budgets = operators.Sampling.budgetsFor(weights, totalBudget)
    val inList = budgets.map(b => s"'${b._1}'").mkString(", ")
    val budgetCase = budgets.map { case (s, b) =>
      s"WHEN source = '$s' THEN $b"
    }.mkString("CASE ", " ", " END")
    s"""SELECT doc_id, source, cum_cost FROM (
       |  SELECT doc_id, source,
       |    CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY
       |      ${PortableHash.hash60Sql(s"'$salt:' || CAST(doc_id AS VARCHAR)")}, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cost
       |  FROM documents
       |  WHERE source IN ($inList) AND n_chars IS NOT NULL AND n_chars >= 0) t
       |WHERE cum_cost <= $budgetCase""".stripMargin
  }

  // ---- q69: int8 scalar quantization — codes and checksum replayed
  // exactly. floor() precedes the BIGINT cast (DuckDB's double→int cast
  // rounds, Spark's truncates; an integral double casts identically).
  def q69Sql(): String =
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), mm AS (
       |  SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax FROM v
       |), q AS (
       |  SELECT vec_id, vmin, vmax,
       |    CASE WHEN vmax > vmin
       |      THEN [least(CAST(floor((x - vmin) * 255.0 / (vmax - vmin)) AS BIGINT), 255)
       |            FOR x IN v]
       |      ELSE [CAST(0 AS BIGINT) FOR x IN v] END AS codes
       |  FROM mm
       |)
       |SELECT vec_id, CAST(len(codes) AS BIGINT) AS n_dims, vmin, vmax,
       |  list_reduce(list_prepend(0::BIGINT, codes),
       |    (acc, c) -> xor(${PortableHash.rot60Sql("acc", 5)}, c)) AS code_checksum
       |FROM q""".stripMargin

  // ---- q71: BM25 — the identical fully-parenthesized arithmetic as
  // operators.Bm25.topK, constants printed in exponent form, terms in
  // the same sorted order, so the double scores are bit-identical.
  def q71Sql(queryTerms: Seq[String] = Seq("merge", "stream", "window"),
             topK: Int = 10, k1: Double = 1.2, b: Double = 0.75): String = {
    val terms = queryTerms.distinct.sorted
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(ws, x -> x = '$t')) AS BIGINT) AS tf_$i"
    }.mkString(",\n    ")
    val dfCols = terms.indices.map { i =>
      s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i"
    }.mkString(",\n    ")
    val anyTf = terms.indices.map(i => s"tf_$i").mkString(" + ")
    val score = terms.indices.map { i =>
      s"(((n_docs - df_$i) + 5.0e-01) / (df_$i + 5.0e-01)) * " +
        s"((CAST(tf_$i AS DOUBLE) * ${dbl(k1 + 1)}) / " +
        s"(CAST(tf_$i AS DOUBLE) + ${dbl(k1)} * (${dbl(1 - b)} + " +
        s"(${dbl(b)} * (dl / (CAST(total_dl AS DOUBLE) / n_docs))))))"
    }.mkString("(", " + ", ")")
    s"""WITH base AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
       |), per AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM base
       |), agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS total_dl,
       |    $dfCols
       |  FROM per
       |), scored AS (
       |  SELECT doc_id, $score AS score
       |  FROM per CROSS JOIN agg
       |  WHERE $anyTf > 0
       |)
       |SELECT doc_id, score FROM scored
       |ORDER BY score DESC, doc_id LIMIT $topK""".stripMargin
  }

  // ---- q77: dedup resolution — the q22 candidate pipeline (verbatim, as
  // a nested-WITH CTE), thresholded, symmetrized, transitively closed by
  // a recursive CTE; component = min over self and everything reachable.
  def q77Sql(threshold: Double = 0.5): String = {
    val cand = q22Sql().linesIterator.map("  " + _).mkString("\n")
    s"""WITH RECURSIVE cand AS (
       |$cand
       |), edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM cand WHERE est_jaccard >= ${dbl(threshold)}
       |  UNION
       |  SELECT doc_b AS u, doc_a AS v FROM cand WHERE est_jaccard >= ${dbl(threshold)}
       |), reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |)
       |SELECT u AS doc_id, least(u, min(v)) AS component
       |FROM reach GROUP BY u""".stripMargin
  }

  // ---- q72: batch replay of the streaming count-min sketch over the
  // events table's event_type column — same constants, same cells.
  def q72Sql(depth: Int = 4, width: Int = 64, seed: Long = 42L): String = {
    val consts = PortableHash.permConstants(depth, seed)
    val jb = consts.zipWithIndex.map { case ((r, c), j) =>
      s"SELECT $j AS j, ${PortableHash.permuteSql("h", r, c)} % $width AS bucket FROM h"
    }.mkString("\n  UNION ALL ")
    s"""WITH h AS (
       |  SELECT ${PortableHash.hash60Sql("event_type")} AS h FROM events
       |), jb AS (
       |  $jb
       |)
       |SELECT j, bucket, count(*) AS cnt FROM jb GROUP BY 1, 2""".stripMargin
  }

  // ---- q101: Reciprocal Rank Fusion — q71's BM25 list (nested verbatim,
  // topK=50) full-outer-joined with the q19-shape cosine list for query
  // vec_id 0; each side's rank is a (score desc, id) row_number, the
  // fused score is COALESCE(1/(60+r_lex), 0) + COALESCE(1/(60+r_sem), 0)
  // — the same fixed two-term IEEE sum the Spark fold emits.
  def q101Sql(queryTerms: Seq[String] = Seq("merge", "stream", "window"),
              listK: Int = 50, kRrf: Int = 60, topK: Int = 10): String = {
    val lex = q71Sql(queryTerms, topK = listK).linesIterator
      .map("  " + _).mkString("\n")
    s"""WITH lex AS (
       |$lex
       |), lexr AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
       |  FROM lex
       |), q AS (
       |  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
       |), c AS (
       |  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS cv
       |  FROM embeddings WHERE vec_id <> 0
       |), sem AS (
       |  SELECT doc_id,
       |    round(list_dot_product(qv, cv)
       |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
       |      6) AS cos_sim
       |  FROM c, q
       |), semr AS (
       |  SELECT doc_id, r FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS r
       |    FROM sem) t
       |  WHERE r <= $listK
       |), fused AS (
       |  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
       |    COALESCE(1.0 / ($kRrf.0 + CAST(l.r AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / ($kRrf.0 + CAST(s.r AS DOUBLE)), 0.0) AS rrf_score
       |  FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
       |)
       |SELECT doc_id, rrf_score FROM fused
       |ORDER BY rrf_score DESC, doc_id LIMIT $topK""".stripMargin
  }

  /** q123: product quantization + ADC search — the FULL pipeline
    * replayed: m independent Lloyd chains over 1-based subvector slices
    * (each the exact q94 fixed-point chain, suffix-disambiguated), final
    * assignments as the codes, the query's m×k distance table as exact
    * long arithmetic over the trained centroids, ADC = the m-way join of
    * codes to tables summing exact longs, and a deterministic
    * (dist, id) top-k. No floats anywhere — training included — so there
    * is NO tolerance in the compare.
    */
  def q123Sql(m: Int = 4, k: Int = 16, iterations: Int = 3,
              scale: Long = 1000000L, dim: Int = 64,
              queryId: Long = 0L, topK: Int = 25): String = {
    require(dim % m == 0)
    val subDim = dim / m
    val chains = (0 until m).map { s =>
      kmeansCtes(k.toString, iterations, scale, subDim, s"_p$s",
        s"embedding[${s * subDim + 1}:${(s + 1) * subDim}]")
    }.mkString(", ")
    val dtabs = (0 until m).map { s =>
      s"""dtab$s AS (
         |  SELECT c.cid,
         |    CAST(list_sum([(q.x[i] - c.c[i]) * (q.x[i] - c.c[i])
         |                   FOR i IN range(1, ${subDim + 1})]) AS BIGINT) AS d2
         |  FROM c${iterations}_p$s c CROSS JOIN
         |       (SELECT x FROM pts_p$s WHERE vec_id = $queryId) q
         |)""".stripMargin
    }.mkString(", ")
    val joins = (1 until m).map(s =>
      s"""  JOIN asg_p$s a$s ON a$s.vec_id = a0.vec_id
         |  JOIN dtab$s t$s ON t$s.cid = a$s.cluster""".stripMargin)
      .mkString("\n")
    val sumExpr = (0 until m).map(s => s"t$s.d2").mkString(" + ")
    s"""WITH $chains, $dtabs, adc AS (
       |  SELECT a0.vec_id, CAST($sumExpr AS BIGINT) AS adc_dist
       |  FROM asg_p0 a0
       |  JOIN dtab0 t0 ON t0.cid = a0.cluster
       |$joins
       |)
       |SELECT vec_id AS cand_id, adc_dist FROM adc
       |WHERE vec_id <> $queryId
       |ORDER BY adc_dist, vec_id LIMIT $topK""".stripMargin
  }

  /** q124: IVF-PQ — the q123 ADC machinery restricted to the query's
    * nprobe nearest IVF cells. One extra Lloyd chain (suffix `_ivf`, the
    * q94 shape at k = nlist over the FULL vectors) supplies the cell
    * assignment and the coarse centroids; `probes` ranks those centroids
    * against the query by exact long distance with the same
    * `ORDER BY d2, cid` tiebreak the Spark driver applies; candidates
    * are the rows whose cell survives. All integer, zero tolerance.
    */
  def q124Sql(nlist: Int = 8, nprobe: Int = 3, m: Int = 4, k: Int = 16,
              iterations: Int = 3, scale: Long = 1000000L, dim: Int = 64,
              queryId: Long = 0L, topK: Int = 25): String = {
    require(dim % m == 0)
    val subDim = dim / m
    val ivfChain = kmeansCtes(nlist.toString, iterations, scale, dim, "_ivf")
    val pqChains = (0 until m).map { s =>
      kmeansCtes(k.toString, iterations, scale, subDim, s"_p$s",
        s"embedding[${s * subDim + 1}:${(s + 1) * subDim}]")
    }.mkString(", ")
    val dtabs = (0 until m).map { s =>
      s"""dtab$s AS (
         |  SELECT c.cid,
         |    CAST(list_sum([(q.x[i] - c.c[i]) * (q.x[i] - c.c[i])
         |                   FOR i IN range(1, ${subDim + 1})]) AS BIGINT) AS d2
         |  FROM c${iterations}_p$s c CROSS JOIN
         |       (SELECT x FROM pts_p$s WHERE vec_id = $queryId) q
         |)""".stripMargin
    }.mkString(", ")
    val joins = (1 until m).map(s =>
      s"""  JOIN asg_p$s a$s ON a$s.vec_id = cand.vec_id
         |  JOIN dtab$s t$s ON t$s.cid = a$s.cluster""".stripMargin)
      .mkString("\n")
    val sumExpr = (0 until m).map(s => s"t$s.d2").mkString(" + ")
    s"""WITH $ivfChain, $pqChains, probes AS (
       |  SELECT c.cid
       |  FROM c${iterations}_ivf c CROSS JOIN
       |       (SELECT x FROM pts_ivf WHERE vec_id = $queryId) q
       |  ORDER BY CAST(list_sum([(q.x[i] - c.c[i]) * (q.x[i] - c.c[i])
       |                          FOR i IN range(1, ${dim + 1})]) AS BIGINT),
       |           c.cid
       |  LIMIT $nprobe
       |), cand AS (
       |  SELECT vec_id, cluster AS cell FROM asg_ivf
       |  WHERE cluster IN (SELECT cid FROM probes)
       |), $dtabs, adc AS (
       |  SELECT cand.vec_id, cand.cell, CAST($sumExpr AS BIGINT) AS adc_dist
       |  FROM cand
       |  JOIN asg_p0 a0 ON a0.vec_id = cand.vec_id
       |  JOIN dtab0 t0 ON t0.cid = a0.cluster
       |$joins
       |)
       |SELECT vec_id AS cand_id, cell, adc_dist FROM adc
       |WHERE vec_id <> $queryId
       |ORDER BY adc_dist, vec_id LIMIT $topK""".stripMargin
  }

  /** q121: KMV distinct estimates. The k smallest distinct portable
    * hashes are replayed with a rank window; the estimator
    * (k−1)·2⁶⁰/h_k is a two-op IEEE tree ((k−1)·2⁶⁰ is exact — 8
    * significand bits times a power of two), identical in both engines.
    */
  def q121Sql(k: Int = 256): String =
    s"""WITH tok AS (
       |  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS t
       |  FROM documents
       |), h AS (
       |  SELECT DISTINCT source, ${PortableHash.hash60Sql("t")} AS h FROM tok
       |), r AS (
       |  SELECT source, h,
       |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM h
       |), sk AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS nd,
       |         max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM r WHERE rn <= $k GROUP BY source
       |), ex AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_exact FROM h GROUP BY source
       |)
       |SELECT sk.source,
       |  CASE WHEN sk.nd < $k THEN CAST(sk.nd AS DOUBLE)
       |       ELSE (${(k - 1).toDouble} * 1152921504606846976.0)
       |            / CAST(sk.hk AS DOUBLE) END AS n_est,
       |  ex.n_exact
       |FROM sk JOIN ex ON sk.source = ex.source""".stripMargin

  /** q139/q140: content-defined chunking. The oracle recomputes every
    * window hash POSITIONALLY — Σ code·B^{w−1−j} with the per-power
    * mod table embedded as a literal, one final mod (all products
    * ≤ 65535·M ≪ 2⁶³, so no intermediate mod is needed) — where the
    * Spark expression rolls incrementally; both are the same residue.
    * Cuts → segments via a lag window; chunks are plain substr.
    */
  private def cdcCtes(w: Int, base: Long, m: Long, d: Long): String = {
    val pw = {
      val a = new Array[Long](w)
      a(0) = 1L
      for (k <- 1 until w) a(k) = a(k - 1) * base % m
      a.mkString("[", ", ", "]")
    }
    s"""cdoc AS MATERIALIZED (
       |  SELECT doc_id, text, length(text) AS n FROM documents
       |), ch AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    list_sum([CAST(unicode(substr(text, i + k - 1, 1)) AS BIGINT)
       |                * ($pw)[$w - k + 1]
       |              FOR k IN range(1, ${w + 1})]) % $m AS h
       |  FROM (SELECT doc_id, text, UNNEST(range(1, n - $w + 2)) AS i
       |        FROM cdoc WHERE n >= $w)
       |), cuts AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, e FROM (
       |    SELECT doc_id, i + $w - 1 AS e FROM ch WHERE h % $d = 0
       |    UNION ALL
       |    SELECT doc_id, n FROM cdoc WHERE n > 0)
       |), seg AS (
       |  SELECT doc_id, e,
       |         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS st
       |  FROM cuts
       |), chunk AS MATERIALIZED (
       |  SELECT s.doc_id,
       |         CAST(row_number() OVER (PARTITION BY s.doc_id ORDER BY s.st)
       |              AS INTEGER) AS chunk_idx,
       |         substr(d.text, s.st, s.e - s.st + 1) AS chunk
       |  FROM seg s JOIN cdoc d USING (doc_id)
       |)""".stripMargin
  }

  def q139Sql(w: Int = 16, base: Long = 31L, m: Long = 1000000007L,
              d: Long = 64L): String =
    s"""WITH ${cdcCtes(w, base, m, d)}
       |SELECT doc_id, chunk_idx, CAST(length(chunk) AS BIGINT) AS chunk_len,
       |       ${PortableHash.hash60Sql("chunk")} AS chunk_hash
       |FROM chunk""".stripMargin

  def q140Sql(w: Int = 16, base: Long = 31L, m: Long = 1000000007L,
              d: Long = 64L, topK: Int = 100): String =
    s"""WITH ${cdcCtes(w, base, m, d)}
       |SELECT chunk, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_occ
       |FROM chunk GROUP BY chunk HAVING count(*) > 1
       |ORDER BY n_occ DESC, chunk LIMIT $topK""".stripMargin

  /** q137/q138: batch-perceptron training, every round unrolled. The
    * update Σ_{y·(w·x) <= 0} y·x is a commutative integer sum, so each
    * round is one filter + d scalar sums; weights thread through as a
    * one-row list CTE. All BIGINT, zero tolerance.
    */
  private def perceptronCtes(rounds: Int, dim: Int): String = {
    val feat =
      s"""feat AS MATERIALIZED (
         |  SELECT doc_id,
         |    [CAST(1 AS BIGINT), CAST(length(text) AS BIGINT),
         |     CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT),
         |     CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT),
         |     CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)] AS x,
         |    CAST(CASE WHEN length(source) = 4 THEN 1 ELSE -1 END AS BIGINT) AS y
         |  FROM documents
         |), w0 AS (SELECT [${Seq.fill(dim)("CAST(0 AS BIGINT)").mkString(", ")}] AS w)"""
        .stripMargin
    val per = (1 to rounds).map { r =>
      val p = r - 1
      val newW = (1 to dim).map(i =>
        s"w.w[$i] + CAST(coalesce((SELECT sum(y * x[$i]) FROM m$r), 0) AS BIGINT)")
        .mkString(",\n         |          ")
      s"""m$r AS MATERIALIZED (
         |  SELECT f.x, f.y FROM feat f CROSS JOIN w$p w
         |  WHERE f.y * list_sum([w.w[i] * f.x[i]
         |                        FOR i IN range(1, ${dim + 1})]) <= 0
         |), w$r AS MATERIALIZED (
         |  SELECT [$newW] AS w
         |  FROM w$p w
         |)""".stripMargin
    }.mkString(", ")
    s"$feat, $per"
  }

  def q137Sql(rounds: Int = 5, dim: Int = 5): String = {
    val union = (1 to rounds).map(r =>
      s"""SELECT CAST($r AS INTEGER) AS round, CAST(i - 1 AS INTEGER) AS idx,
         |       w.w[i] AS weight
         |FROM w$r w, (SELECT UNNEST(range(1, ${dim + 1})) AS i)""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"WITH ${perceptronCtes(rounds, dim)}\n$union"
  }

  def q138Sql(rounds: Int = 5, dim: Int = 5): String =
    s"""WITH ${perceptronCtes(rounds, dim)}
       |SELECT f.doc_id,
       |  CAST(list_sum([w.w[i] * f.x[i]
       |                 FOR i IN range(1, ${dim + 1})]) AS BIGINT) AS margin,
       |  CAST(CASE WHEN list_sum([w.w[i] * f.x[i]
       |                           FOR i IN range(1, ${dim + 1})]) > 0
       |            THEN 1 ELSE -1 END AS INTEGER) AS predicted
       |FROM feat f CROSS JOIN w$rounds w""".stripMargin

  /** q143: RESIDUAL IVF-PQ — q124 with `by_residual=true`. The coarse
    * chain feeds a `resid` CTE (x − centroid[cell], exact longs); the m
    * PQ chains train over residual slices at scale 1 (floor(double·1)
    * is the identity on longs); the query builds one distance-table set
    * PER PROBED CELL from its per-cell residual, and the ADC join keys
    * on (cell, code). All integer, zero tolerance.
    */
  def q143Sql(nlist: Int = 8, nprobe: Int = 3, m: Int = 4, k: Int = 16,
              iterations: Int = 3, scale: Long = 1000000L, dim: Int = 64,
              queryId: Long = 0L, topK: Int = 25): String = {
    require(dim % m == 0)
    val subDim = dim / m
    val ivfChain = kmeansCtes(nlist.toString, iterations, scale, dim, "_ivf")
    val residCte =
      s"""resid AS MATERIALIZED (
         |  SELECT p.vec_id,
         |    [p.x[i] - c.c[i] FOR i IN range(1, ${dim + 1})] AS rx
         |  FROM pts_ivf p
         |  JOIN asg_ivf a ON a.vec_id = p.vec_id
         |  JOIN c${iterations}_ivf c ON c.cid = a.cluster
         |)""".stripMargin
    val pqChains = (0 until m).map { s =>
      kmeansCtes(k.toString, iterations, scale = 1L, subDim, s"_p$s",
        s"rx[${s * subDim + 1}:${(s + 1) * subDim}]", srcTable = "resid")
    }.mkString(", ")
    val dtabs = (0 until m).map { s =>
      val lo = s * subDim
      s"""dtab$s AS MATERIALIZED (
         |  SELECT qr.cell, cb.cid,
         |    CAST(list_sum([(qr.rx[$lo + i] - cb.c[i]) * (qr.rx[$lo + i] - cb.c[i])
         |                   FOR i IN range(1, ${subDim + 1})]) AS BIGINT) AS d2
         |  FROM qres qr CROSS JOIN c${iterations}_p$s cb
         |)""".stripMargin
    }.mkString(", ")
    val joins = (1 until m).map(s =>
      s"""  JOIN asg_p$s a$s ON a$s.vec_id = cand.vec_id
         |  JOIN dtab$s t$s ON t$s.cell = cand.cell AND t$s.cid = a$s.cluster""".stripMargin)
      .mkString("\n")
    val sumExpr = (0 until m).map(s => s"t$s.d2").mkString(" + ")
    s"""WITH $ivfChain, $residCte, $pqChains, probes AS MATERIALIZED (
       |  SELECT c.cid
       |  FROM c${iterations}_ivf c CROSS JOIN
       |       (SELECT x FROM pts_ivf WHERE vec_id = $queryId) q
       |  ORDER BY CAST(list_sum([(q.x[i] - c.c[i]) * (q.x[i] - c.c[i])
       |                          FOR i IN range(1, ${dim + 1})]) AS BIGINT),
       |           c.cid
       |  LIMIT $nprobe
       |), qres AS MATERIALIZED (
       |  SELECT pr.cid AS cell,
       |    [q.x[i] - c.c[i] FOR i IN range(1, ${dim + 1})] AS rx
       |  FROM probes pr
       |  JOIN c${iterations}_ivf c ON c.cid = pr.cid
       |  CROSS JOIN (SELECT x FROM pts_ivf WHERE vec_id = $queryId) q
       |), cand AS MATERIALIZED (
       |  SELECT vec_id, cluster AS cell FROM asg_ivf
       |  WHERE cluster IN (SELECT cid FROM probes)
       |), $dtabs, adc AS (
       |  SELECT cand.vec_id, cand.cell, CAST($sumExpr AS BIGINT) AS adc_dist
       |  FROM cand
       |  JOIN asg_p0 a0 ON a0.vec_id = cand.vec_id
       |  JOIN dtab0 t0 ON t0.cell = cand.cell AND t0.cid = a0.cluster
       |$joins
       |)
       |SELECT vec_id AS cand_id, cell, adc_dist FROM adc
       |WHERE vec_id <> $queryId
       |ORDER BY adc_dist, vec_id LIMIT $topK""".stripMargin
  }

  /** q144/q145: AMS sketches — counters replay as plain signed integer
    * sums (commutative both engines), estimates as exact products, the
    * median as a rank pick over a depth spine (a depth row with no
    * surviving cells counts as 0, exactly as the Spark side pads).
    */
  private def amsCounters(depth: Int, width: Int, sfx: String): String =
    s"""e$sfx AS (
       |  SELECT j.j, v FROM src$sfx CROSS JOIN
       |    (SELECT UNNEST(range(0, $depth)) AS j) j
       |), c$sfx AS MATERIALIZED (
       |  SELECT j, h % $width AS bucket,
       |         CAST(sum(1 - 2 * ((h >> 20) & 1)) AS BIGINT) AS c
       |  FROM (SELECT j,
       |          ${PortableHash.hash60Sql("CAST(j AS VARCHAR) || ':' || v")} AS h
       |        FROM e$sfx)
       |  GROUP BY 1, 2
       |)""".stripMargin

  def q144Sql(depth: Int = 5, width: Int = 256): String =
    s"""WITH src AS (
       |  SELECT unnest(regexp_extract_all(text, '\\S+')) AS v FROM documents
       |), ${amsCounters(depth, width, "")}, per AS (
       |  SELECT s.j, CAST(coalesce(p.est, 0) AS BIGINT) AS f2_est
       |  FROM (SELECT UNNEST(range(0, $depth)) AS j) s
       |  LEFT JOIN (SELECT j, sum(c * c) AS est FROM c GROUP BY j) p
       |    ON p.j = s.j
       |), med AS (
       |  SELECT f2_est FROM (
       |    SELECT f2_est, row_number() OVER (ORDER BY f2_est, j) AS rn FROM per)
       |  WHERE rn = ${(depth + 1) / 2}
       |), ex AS (
       |  SELECT CAST(sum(n * n) AS BIGINT) AS f2_exact
       |  FROM (SELECT count(*) AS n FROM src GROUP BY v)
       |)
       |SELECT med.f2_est, ex.f2_exact FROM med CROSS JOIN ex""".stripMargin

  def q145Sql(depth: Int = 5, width: Int = 256): String =
    s"""WITH srca AS (
       |  SELECT CAST(user_id AS VARCHAR) AS v FROM events
       |  WHERE event_type = 'click'
       |), srcb AS (
       |  SELECT CAST(user_id AS VARCHAR) AS v FROM events
       |  WHERE event_type = 'view'
       |), ${amsCounters(depth, width, "a")},
       |${amsCounters(depth, width, "b")}, per AS (
       |  SELECT s.j, CAST(coalesce(p.est, 0) AS BIGINT) AS join_est
       |  FROM (SELECT UNNEST(range(0, $depth)) AS j) s
       |  LEFT JOIN (
       |    SELECT ca.j, sum(ca.c * cb.c) AS est
       |    FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
       |    GROUP BY ca.j) p ON p.j = s.j
       |), med AS (
       |  SELECT join_est FROM (
       |    SELECT join_est, row_number() OVER (ORDER BY join_est, j) AS rn
       |    FROM per)
       |  WHERE rn = ${(depth + 1) / 2}
       |), ex AS (
       |  SELECT CAST(coalesce(sum(fa.n * fb.n), 0) AS BIGINT) AS join_exact
       |  FROM (SELECT v, count(*) AS n FROM srca GROUP BY v) fa
       |  JOIN (SELECT v, count(*) AS n FROM srcb GROUP BY v) fb ON fa.v = fb.v
       |)
       |SELECT med.join_est, ex.join_exact FROM med CROSS JOIN ex""".stripMargin

  /** q131/q132: BPE-style merge learning, every round unrolled. Per
    * round: `pr` = all adjacent pairs with positions, `ch` = the winner
    * (`ORDER BY c DESC, a, b LIMIT 1` — the Spark tiebreak), `mm` =
    * greedy non-overlapping matches via islands arithmetic (consecutive
    * match positions — only possible when left = right — keep even
    * offsets from the run start), `st` = the rebuilt state (fused symbol
    * at kept positions, positions consumed by a kept left neighbor
    * dropped). All counting is exact integers, all symbols are exact
    * string concatenations — no tolerance anywhere.
    */
  private def bpeCtes(rounds: Int): String = {
    val per = (1 to rounds).map { r =>
      val p = r - 1
      s"""pr$r AS MATERIALIZED (
         |  SELECT doc_id, i AS p, syms[i] AS a, syms[i + 1] AS b
         |  FROM (SELECT doc_id, UNNEST(range(1, len(syms))) AS i, syms
         |        FROM st$p)
         |), ch$r AS MATERIALIZED (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS c
         |  FROM pr$r GROUP BY a, b
         |  ORDER BY c DESC, a, b LIMIT 1
         |), mm$r AS MATERIALIZED (
         |  SELECT doc_id, p FROM (
         |    SELECT x.doc_id, x.p,
         |           min(x.p) OVER (PARTITION BY x.doc_id, x.p - x.rn) AS rs
         |    FROM (SELECT pr.doc_id, pr.p,
         |                 row_number() OVER (PARTITION BY pr.doc_id
         |                                    ORDER BY pr.p) AS rn
         |          FROM pr$r pr JOIN ch$r ch ON pr.a = ch.a AND pr.b = ch.b) x
         |  ) y WHERE (p - rs) % 2 = 0
         |), po$r AS MATERIALIZED (
         |  SELECT doc_id, i, syms[i] AS sym
         |  FROM (SELECT doc_id, UNNEST(range(1, len(syms) + 1)) AS i, syms
         |        FROM st$p)
         |), st$r AS MATERIALIZED (
         |  SELECT po.doc_id,
         |         list(CASE WHEN k.p IS NOT NULL
         |                   THEN (SELECT a || ' ' || b FROM ch$r)
         |                   ELSE po.sym END ORDER BY po.i) AS syms
         |  FROM po$r po
         |  LEFT JOIN mm$r k  ON k.doc_id = po.doc_id AND k.p = po.i
         |  LEFT JOIN mm$r k2 ON k2.doc_id = po.doc_id AND k2.p = po.i - 1
         |  WHERE k2.p IS NULL
         |  GROUP BY po.doc_id
         |)""".stripMargin
    }.mkString(", ")
    s"""st0 AS MATERIALIZED (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS syms
       |  FROM documents
       |), $per""".stripMargin
  }

  /** q133: k-core peeling, every round a plain CTE triple — edges
    * induced by the previous survivors, degrees, the >= k filter. The
    * graph is the q118 derived-constant discipline: a variable-density
    * ring (node u links u+1..u+(1+u%5) mod n) that peels in cascades,
    * plus a hub circulant (every 20th node to its 5 next hubs) that
    * survives as the nonempty 5-core. Output = round-R survivors with
    * their degree in round R's input subgraph. All integers.
    */
  def q133Sql(k: Int = 5, rounds: Int = 6): String = {
    val per = (1 to rounds).map { r =>
      val p = r - 1
      s"""e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM canon e
         |  JOIN a$p x ON e.a = x.node
         |  JOIN a$p y ON e.b = y.node
         |), d$r AS MATERIALIZED (
         |  SELECT node, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT a AS node FROM e$r UNION ALL SELECT b FROM e$r)
         |  GROUP BY node
         |), a$r AS MATERIALIZED (
         |  SELECT node FROM d$r WHERE deg >= $k
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM part),
       |e0 AS (
       |  SELECT p_partkey AS x,
       |         (p_partkey + d.d) % (SELECT n FROM nn) AS y
       |  FROM part CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS d(d)
       |  WHERE d.d <= 1 + p_partkey % 5
       |  UNION ALL
       |  SELECT p_partkey, (p_partkey + 20 * h.j) % (SELECT n FROM nn)
       |  FROM part CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS h(j)
       |  WHERE p_partkey % 20 = 0
       |),
       |canon AS MATERIALIZED (
       |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
       |  FROM e0 WHERE x <> y
       |),
       |a0 AS MATERIALIZED (
       |  SELECT DISTINCT node FROM
       |    (SELECT a AS node FROM canon UNION ALL SELECT b FROM canon)
       |), $per
       |SELECT node, deg FROM d$rounds WHERE deg >= $k""".stripMargin
  }

  /** q163: deterministic synchronous label propagation — the q133
    * ring+hub graph, R unrolled voting rounds: each node's next label is
    * the most frequent previous-round label among its neighbors, ties to
    * the smallest label (row_number replay of the struct-min argmax).
    * MATERIALIZED per the q133 lesson; all integers.
    */
  def q163Sql(rounds: Int = 4): String = {
    val per = (1 to rounds).map { r =>
      val p = r - 1
      s"""v$r AS MATERIALIZED (
         |  SELECT s.u AS node, l.lbl AS lbl, CAST(count(*) AS BIGINT) AS c
         |  FROM sym s JOIN l$p l ON s.v = l.node
         |  GROUP BY 1, 2
         |), l$r AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |      row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
         |    FROM v$r
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM part),
       |e0 AS (
       |  SELECT p_partkey AS x,
       |         (p_partkey + d.d) % (SELECT n FROM nn) AS y
       |  FROM part CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS d(d)
       |  WHERE d.d <= 1 + p_partkey % 5
       |  UNION ALL
       |  SELECT p_partkey, (p_partkey + 20 * h.j) % (SELECT n FROM nn)
       |  FROM part CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS h(j)
       |  WHERE p_partkey % 20 = 0
       |),
       |canon AS MATERIALIZED (
       |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
       |  FROM e0 WHERE x <> y
       |),
       |sym AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM canon
       |  UNION ALL SELECT b, a FROM canon
       |),
       |l0 AS MATERIALIZED (
       |  SELECT DISTINCT u AS node, u AS lbl FROM sym
       |), $per
       |SELECT node, lbl AS label FROM l$rounds""".stripMargin
  }

  /** q169: the communities-to-curation composition — MinHash candidate
    * pairs (the shared q22 CTE chain) feed R unrolled LPA voting rounds
    * (the q163 shape), singletons keep their own label, then the q97
    * salted-rank cap replays per community. MATERIALIZED per the q133
    * lesson.
    */
  def q169Sql(rounds: Int = 3, cap: Int = 1, shingleK: Int = 3,
              numHashes: Int = 16, bands: Int = 4, seed: Long = 42L): String = {
    val per = (1 to rounds).map { r =>
      val p = r - 1
      s"""v$r AS MATERIALIZED (
         |  SELECT s.u AS node, l.lbl AS lbl, CAST(count(*) AS BIGINT) AS c
         |  FROM sym s JOIN l$p l ON s.v = l.node
         |  GROUP BY 1, 2
         |), l$r AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |      row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
         |    FROM v$r
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${minhashPairCtes(shingleK, numHashes, bands, seed)}, canon AS MATERIALIZED (
       |  SELECT DISTINCT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
       |  FROM pairs WHERE doc_a <> doc_b
       |), sym AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM canon UNION ALL SELECT b, a FROM canon
       |), l0 AS MATERIALIZED (
       |  SELECT DISTINCT u AS node, u AS lbl FROM sym
       |), $per, labeled AS (
       |  SELECT d.doc_id, COALESCE(l.lbl, d.doc_id) AS community
       |  FROM documents d LEFT JOIN l$rounds l ON l.node = d.doc_id
       |)
       |SELECT doc_id, community, rank_in_group FROM (
       |  SELECT doc_id, community,
       |    row_number() OVER (PARTITION BY community ORDER BY
       |      ${graft.functions.PortableHash.hash60Sql(
                 "'commcap:' || CAST(doc_id AS VARCHAR)")}, doc_id)
       |      AS rank_in_group
       |  FROM labeled) t
       |WHERE rank_in_group <= $cap""".stripMargin
  }

  /** q177: WEIGHTED label propagation — the q169 chain with each vote
    * weighted by the pair's exact MinHash match count (an integer, so
    * the vote sums replay; a float similarity weight would not).
    */
  def q177Sql(rounds: Int = 3, shingleK: Int = 3, numHashes: Int = 16,
              bands: Int = 4, seed: Long = 42L): String = {
    val per = (1 to rounds).map { r =>
      val p = r - 1
      s"""v$r AS MATERIALIZED (
         |  SELECT s.u AS node, l.lbl AS lbl, CAST(sum(s.w) AS BIGINT) AS c
         |  FROM sym s JOIN l$p l ON s.v = l.node
         |  GROUP BY 1, 2
         |), l$r AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl,
         |      row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
         |    FROM v$r
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${minhashPairCtes(shingleK, numHashes, bands, seed)}, pw AS MATERIALIZED (
       |  SELECT p.doc_a AS a0, p.doc_b AS b0,
       |    CAST(list_sum([CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END
       |                   FOR j IN range(1, ${numHashes + 1})]) AS BIGINT) AS w
       |  FROM pairs p
       |  JOIN sig sa ON sa.doc_id = p.doc_a
       |  JOIN sig sb ON sb.doc_id = p.doc_b
       |), canon AS MATERIALIZED (
       |  SELECT least(a0, b0) AS a, greatest(a0, b0) AS b, max(w) AS w
       |  FROM pw WHERE a0 <> b0 GROUP BY 1, 2
       |), sym AS MATERIALIZED (
       |  SELECT a AS u, b AS v, w FROM canon
       |  UNION ALL SELECT b, a, w FROM canon
       |), l0 AS MATERIALIZED (
       |  SELECT DISTINCT u AS node, u AS lbl FROM sym
       |), $per
       |SELECT node, lbl AS label FROM l$rounds""".stripMargin
  }

  /** q135: k-truss peeling — the q133 shape at EDGE level: each round
    * enumerates triangles over the survivors (the q118 x<y<z join),
    * counts each edge's support through a 3-way union, keeps
    * support >= k−2. Same derived ring+hub graph; MATERIALIZED per the
    * q133 lesson. All integers.
    */
  def q135Sql(k: Int = 5, rounds: Int = 4): String = {
    val per = (1 to rounds).map { r =>
      val prev = if (r == 1) "canon" else s"te${r - 1}"
      s"""tt$r AS MATERIALIZED (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM $prev e1
         |  JOIN $prev e2 ON e2.a = e1.b
         |  JOIN $prev e3 ON e3.a = e1.a AND e3.b = e2.b
         |), ts$r AS MATERIALIZED (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS support
         |  FROM (SELECT x AS a, y AS b FROM tt$r
         |        UNION ALL SELECT y, z FROM tt$r
         |        UNION ALL SELECT x, z FROM tt$r)
         |  GROUP BY a, b
         |), te$r AS MATERIALIZED (
         |  SELECT a, b FROM ts$r WHERE support >= ${k - 2}
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM part),
       |e0 AS (
       |  SELECT p_partkey AS x,
       |         (p_partkey + d.d) % (SELECT n FROM nn) AS y
       |  FROM part CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS d(d)
       |  WHERE d.d <= 1 + p_partkey % 5
       |  UNION ALL
       |  SELECT p_partkey, (p_partkey + 20 * h.j) % (SELECT n FROM nn)
       |  FROM part CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS h(j)
       |  WHERE p_partkey % 20 = 0
       |),
       |canon AS MATERIALIZED (
       |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
       |  FROM e0 WHERE x <> y
       |), $per
       |SELECT a, b, support FROM ts$rounds WHERE support >= ${k - 2}""".stripMargin
  }

  /** q153: capped coreness — the q133 peel CTEs swept over k = 1..kMax
    * with `roundsPerK` rounds per level; nodes dropped at level k carry
    * coreness k−1 (anti-join between consecutive levels' survivors),
    * sweep survivors carry kMax. MATERIALIZED throughout (q133 lesson).
    */
  def q153Sql(kMax: Int = 6, roundsPerK: Int = 6): String = {
    def aliveName(k: Int): String = if (k == 0) "a0" else s"ak${k}r$roundsPerK"
    val levels = (1 to kMax).map { k =>
      val rounds = (1 to roundsPerK).map { r =>
        val prev = if (r == 1) aliveName(k - 1) else s"ak${k}r${r - 1}"
        s"""ek${k}r$r AS MATERIALIZED (
           |  SELECT e.a, e.b FROM canon e
           |  JOIN $prev x ON e.a = x.node
           |  JOIN $prev y ON e.b = y.node
           |), dk${k}r$r AS MATERIALIZED (
           |  SELECT node, CAST(count(*) AS BIGINT) AS deg
           |  FROM (SELECT a AS node FROM ek${k}r$r
           |        UNION ALL SELECT b FROM ek${k}r$r)
           |  GROUP BY node
           |), ak${k}r$r AS MATERIALIZED (
           |  SELECT node FROM dk${k}r$r WHERE deg >= $k
           |)""".stripMargin
      }.mkString(", ")
      val rm =
        s"""rm$k AS MATERIALIZED (
           |  SELECT p.node, CAST(${k - 1} AS BIGINT) AS coreness
           |  FROM ${aliveName(k - 1)} p
           |  LEFT JOIN ${aliveName(k)} n ON n.node = p.node
           |  WHERE n.node IS NULL
           |)""".stripMargin
      s"$rounds, $rm"
    }.mkString(", ")
    val union = ((1 to kMax).map(k => s"SELECT node, coreness FROM rm$k") :+
      s"SELECT node, CAST($kMax AS BIGINT) AS coreness FROM ${aliveName(kMax)}")
      .mkString("\nUNION ALL\n")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM part),
       |e0 AS (
       |  SELECT p_partkey AS x,
       |         (p_partkey + d.d) % (SELECT n FROM nn) AS y
       |  FROM part CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS d(d)
       |  WHERE d.d <= 1 + p_partkey % 5
       |  UNION ALL
       |  SELECT p_partkey, (p_partkey + 20 * h.j) % (SELECT n FROM nn)
       |  FROM part CROSS JOIN (VALUES (1), (2), (3), (4), (5)) AS h(j)
       |  WHERE p_partkey % 20 = 0
       |),
       |canon AS MATERIALIZED (
       |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
       |  FROM e0 WHERE x <> y
       |),
       |a0 AS MATERIALIZED (
       |  SELECT DISTINCT node FROM
       |    (SELECT a AS node FROM canon UNION ALL SELECT b FROM canon)
       |), $levels
       |$union""".stripMargin
  }

  def q131Sql(rounds: Int = 4): String = {
    val union = (1 to rounds).map(r =>
      s"SELECT CAST($r AS INTEGER) AS round, a AS left_sym, b AS right_sym, " +
        s"c AS pair_count FROM ch$r").mkString("\nUNION ALL\n")
    s"WITH ${bpeCtes(rounds)}\n$union"
  }

  def q132Sql(rounds: Int = 4, topK: Int = 50): String =
    s"""WITH ${bpeCtes(rounds)}
       |SELECT sym, CAST(count(*) AS BIGINT) AS n_occ
       |FROM (SELECT UNNEST(syms) AS sym FROM st$rounds)
       |GROUP BY sym ORDER BY n_occ DESC, sym LIMIT $topK""".stripMargin

  /** q134: per-doc shape of the final BPE state — docs that fused (or
    * tokenized) to nothing drop out of the unnest/rebuild chain, so the
    * LEFT JOIN restores them with an empty list (list[1] of an empty
    * list is NULL in DuckDB, matching Spark's null-safe get()).
    */
  def q134Sql(rounds: Int = 4): String =
    s"""WITH ${bpeCtes(rounds)}
       |SELECT d.doc_id,
       |       CAST(len(coalesce(st.syms, [])) AS BIGINT) AS n_syms,
       |       coalesce(st.syms, [])[1] AS first_sym
       |FROM documents d LEFT JOIN st$rounds st ON d.doc_id = st.doc_id""".stripMargin

  /** q129: the q121 distinct estimate WITHOUT the exact-verify column —
    * the sketch-store gate's shape. Deliberately identical arithmetic:
    * the store's merged minima equal the one-shot minima (bottom-k is a
    * pure set function), so the incremental path must reproduce this
    * one-shot replay bit-for-bit.
    */
  def q129Sql(k: Int = 256): String =
    s"""WITH tok AS (
       |  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS t
       |  FROM documents
       |), h AS (
       |  SELECT DISTINCT source, ${PortableHash.hash60Sql("t")} AS h FROM tok
       |), r AS (
       |  SELECT source, h,
       |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM h
       |), sk AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS nd,
       |         max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM r WHERE rn <= $k GROUP BY source
       |)
       |SELECT source,
       |  CASE WHEN nd < $k THEN CAST(nd AS DOUBLE)
       |       ELSE (${(k - 1).toDouble} * 1152921504606846976.0)
       |            / CAST(hk AS DOUBLE) END AS n_est
       |FROM sk""".stripMargin

  /** q136: the streaming KMV's batch replay — identical estimator to
    * q129 but grouped by event_type over distinct user hashes; the
    * streaming result must equal it bit-for-bit because the bottom-k
    * state is a pure function of the value set (micro-batch boundaries
    * invisible).
    */
  def q136Sql(k: Int = 64): String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |         ${PortableHash.hash60Sql("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events
       |), r AS (
       |  SELECT event_type, h,
       |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h
       |), sk AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
       |         max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM r WHERE rn <= $k GROUP BY event_type
       |)
       |SELECT event_type,
       |  CASE WHEN nd < $k THEN CAST(nd AS DOUBLE)
       |       ELSE (${(k - 1).toDouble} * 1152921504606846976.0)
       |            / CAST(hk AS DOUBLE) END AS n_est
       |FROM sk""".stripMargin

  /** q122: KMV intersection matrix via the min-theta rule, replayed over
    * the same rank-limited hash lists (1-based list slice = the k
    * smallest).
    */
  def q122Sql(k: Int = 256): String =
    s"""WITH tok AS (
       |  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS t
       |  FROM documents
       |), h AS (
       |  SELECT DISTINCT source, ${PortableHash.hash60Sql("t")} AS h FROM tok
       |), r AS (
       |  SELECT source, h,
       |         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM h
       |), sk AS (
       |  SELECT source, list(h ORDER BY h) AS mins
       |  FROM r WHERE rn <= $k GROUP BY source
       |), p AS (
       |  SELECT a.source AS group_a, b.source AS group_b,
       |         a.mins AS ma, b.mins AS mb,
       |         least(
       |           CASE WHEN len(a.mins) < $k THEN 1152921504606846976
       |                ELSE a.mins[$k] END,
       |           CASE WHEN len(b.mins) < $k THEN 1152921504606846976
       |                ELSE b.mins[$k] END) AS th
       |  FROM sk a JOIN sk b ON a.source < b.source
       |)
       |SELECT group_a, group_b,
       |  CASE WHEN len(ma) < $k AND len(mb) < $k
       |       THEN CAST(len(list_filter(list_intersect(ma, mb),
       |                                 x -> x < th)) AS DOUBLE)
       |       ELSE (CAST(len(list_filter(list_intersect(ma, mb),
       |                                  x -> x < th)) AS DOUBLE)
       |             * 1152921504606846976.0) / CAST(th AS DOUBLE)
       |  END AS inter_est
       |FROM p""".stripMargin

  /** q116: Pearson matrix from exact integer moments. The SQL is GENERATED
    * from the same measure list the Spark plan uses so the pair order, the
    * cent scaling, and the fixed IEEE finish tree
    * (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²)·(n·Σy² − Σy²)) stay mirrored —
    * every moment is an exact BIGINT, so no summation-order risk; round()
    * never sees a .5 tie because 2-decimal measures ×100 land on integers
    * up to float noise.
    */
  def q116Sql(): String = {
    val ms = Seq(
      "quantity" -> "CAST(l_quantity AS BIGINT)",
      "discount" -> "CAST(round(l_discount * 100) AS BIGINT)",
      "tax"      -> "CAST(round(l_tax * 100) AS BIGINT)")
    val names = ms.map(_._1)
    val sel = ms.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val sums = (names.map(n => s"CAST(sum($n) AS BIGINT) AS s_$n") ++
      names.map(n => s"CAST(sum($n*$n) AS BIGINT) AS ss_$n") ++
      names.combinations(2).map { case Seq(a, b) =>
        s"CAST(sum($a*$b) AS BIGINT) AS sp_${a}_$b"
      }).mkString(",\n       ")
    def vn(x: String) =
      s"(CAST(n AS DOUBLE)*CAST(ss_$x AS DOUBLE) - CAST(s_$x AS DOUBLE)*CAST(s_$x AS DOUBLE))"
    val pairs = names.combinations(2).map { case Seq(a, b) =>
      s"""SELECT '$a' AS col_x, '$b' AS col_y, n,
         |  CASE WHEN ${vn(a)} = 0 OR ${vn(b)} = 0 THEN NULL
         |       ELSE (CAST(n AS DOUBLE)*CAST(sp_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE)*CAST(s_$b AS DOUBLE))
         |            / sqrt(${vn(a)} * ${vn(b)})
         |  END AS corr
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH v AS (SELECT $sel FROM lineitem),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |       $sums
       |  FROM v
       |)
       |$pairs""".stripMargin
  }

  /** q256: greedy maximum coverage over word BIGRAMS, `rounds` rounds
    * unrolled — each round scores every document by its count of
    * still-uncovered bigrams (ANTI JOIN against the accumulated cover),
    * draws the winner by the (gain DESC, doc_id) total order, and extends
    * the cover. Bigrams, not unigrams: the synthetic corpus has only 31
    * distinct whitespace tokens, so the unigram universe degenerates (one
    * document covers all of it in round 1); the ~900-bigram universe
    * keeps all `rounds` draws live. An exhausted round yields an empty
    * sN, so later rounds stay empty and the UNION simply stops growing —
    * the operator's early stop, replayed. Every round CTE is MATERIALIZED
    * (the unrolled-oracle ENOSPC discipline).
    */
  def q256Sql(rounds: Int = 10): String = {
    val ctes = (1 to rounds).map { r =>
      val src =
        if (r == 1) "toks t"
        else s"toks t ANTI JOIN c${r - 1} ON t.tok = c${r - 1}.tok"
      val cov =
        if (r == 1)
          "c1 AS MATERIALIZED (SELECT DISTINCT t.tok FROM toks t JOIN s1 USING (doc_id))"
        else
          s"""c$r AS MATERIALIZED (
             |  SELECT tok FROM c${r - 1}
             |  UNION
             |  SELECT t.tok FROM toks t JOIN s$r USING (doc_id))""".stripMargin
      s"""s$r AS MATERIALIZED (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS gain
         |  FROM $src
         |  GROUP BY 1 ORDER BY gain DESC, t.doc_id LIMIT 1
         |), $cov""".stripMargin
    }
    val unions = (1 to rounds)
      .map(r => s"SELECT CAST($r AS BIGINT) AS round, doc_id, gain FROM s$r")
      .mkString("\nUNION ALL\n")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, g AS tok FROM (
       |    SELECT doc_id,
       |      unnest([ws[i + 0] || ' ' || ws[i + 1]
       |              FOR i IN range(1, len(ws))]) AS g
       |    FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws
       |          FROM documents)
       |    WHERE len(ws) >= 2)
       |), ${ctes.mkString(",\n")}
       |$unions""".stripMargin
  }
}
