package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (north-star extension, BASELINE.json).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast, so
  *    the candidate side streams through a map-side join with no shuffle of
  *    the (huge) candidate table; the only shuffle is the final per-query
  *    top-k window over |Q|·k rows.
  *  - [[lshTopK]]: random-hyperplane LSH buckets restrict scoring to
  *    candidates sharing a bucket with the query, turning the broadcast-scan
  *    into a bucket-equi-join that prunes most of the corpus.
  *  - [[ivfTopK]]: the 100 TB scale path — an IVF coarse quantizer whose
  *    centroids are plan literals, so cell assignment is a pure per-row
  *    projection (no shuffle); queries probe only their nprobe nearest cells.
  *
  * All pair scoring uses [[VectorFunctions.cosineFromNormSq]]: squared norms
  * are computed once per row before the join, so each candidate pair costs a
  * single dot product.
  */
object Similarity {

  /** Exact top-k cosine neighbors for every query row.
    * @param emb       (idCol, vecCol) corpus
    * @param queries   (idCol, vecCol) query set — must be broadcast-sized
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFunctions.normSq(col(vecCol)).as("qn"))
    val c = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      VectorFunctions.normSq(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos_sim"), col("rank"))
  }

  /** IVF-style ANN: a coarse quantizer partitions the corpus into up to
    * nlist cells; queries probe only their nprobe nearest cells.
    *
    * Centroid seeding is a deterministic id-stride draw (`idCol %
    * centroidStride == 0`, smallest nlist ids) — NO `count()` pre-scan of
    * the corpus, so query cost never includes an extra full read. Optional
    * `lloydRounds` k-means refinement sharpens the cells: each round is one
    * corpus scan (assignment against broadcast centroids, a skinny
    * posexplode/groupBy average — never a shuffle of the vectors
    * themselves). At 100 TB, fit the centroids on `emb.sample(...)` and
    * pass the result's stride/rounds here; the search path is unchanged.
    *
    * Centroid distribution adapts to nlist: small sets are embedded as plan
    * literals (whole-stage-codegen'd per-row projection); past
    * `literalCentroidMax` the centroid table rides along as ONE
    * broadcast-joined array column, so plan size and codegen stay O(1)
    * while real IVF geometries (nlist ~ sqrt(n), tens of thousands) remain
    * expressible. Either way the corpus is never shuffled for assignment,
    * and the cell id is the natural bucketing/partition key for storage.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              centroidStride: Long = 31L, lloydRounds: Int = 0,
              literalCentroidMax: Int = 64): DataFrame = {
    val cents = deriveCentroids(emb, idCol, vecCol, nlist, centroidStride,
      lloydRounds, literalCentroidMax)
    val assigned = withCellId(emb, idCol, vecCol, cents, literalCentroidMax)
      .select(col("cand_id"), col("cv"), col("cn"), col("cell_id"))
    val probes = probeFrame(queries, idCol, vecCol, cents, nprobe,
      literalCentroidMax)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
      .select(col("query_id"), col("cand_id"), col("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** [[ivfTopK]]'s centroid set: the deterministic id-stride draw plus
    * optional Lloyd refinement — shared verbatim by the one-shot search
    * and [[buildIvfStore]], so a persisted index replays the exact cell
    * structure (and thus the exact answers) of the inline path.
    */
  private def deriveCentroids(emb: DataFrame, idCol: String, vecCol: String,
                              nlist: Int, centroidStride: Long,
                              lloydRounds: Int,
                              literalCentroidMax: Int): Seq[(Long, Array[Double], Double)] = {
    var cents: Seq[(Long, Array[Double], Double)] = emb
      .filter(col(idCol) % centroidStride === 0)
      .orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().toSeq
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v, math.sqrt(v.map(x => x * x).sum))
      }
      .filter(_._3 > 0d) // a zero-norm centroid can never win a cosine argmax
    require(cents.nonEmpty,
      s"ivfTopK: no non-zero-norm centroids drawn (stride=$centroidStride) — " +
        "is the corpus empty or the id column not aligned with the stride?")

    // Lloyd refinement: reassign + re-average over (cell, dimension) — a
    // long-format aggregate; the wide vectors never shuffle. The per-cell
    // mean is a SORTED left-fold sum divided by the count, not avg(): IEEE
    // addition is order-dependent in the last ulp, and both Spark's partial
    // aggregate merge order and DuckDB's scan order are scheduling-
    // dependent, so avg() would make the refined centroids (and thus
    // borderline cell assignments) flicker across runs and engines. Sorting
    // the member values first makes the sum a pure function of the multiset
    // — bit-identical everywhere. Cost: collect_list buffers one cell's
    // values per (cell, dim) group; at extreme corpus scale fit centroids
    // on emb.sample(...) (see above) so the buffered group stays bounded.
    for (_ <- 1 to lloydRounds) {
      val assigned = withCellId(emb, idCol, vecCol, cents, literalCentroidMax)
      val dim = cents.head._2.length
      val means = assigned
        .select(col("cell_id"), posexplode(col("cv").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy(col("cell_id"), col("pos"))
        .agg((aggregate(sort_array(collect_list(col("x"))), lit(0d), (a, x) => a + x)
          / count(lit(1))).as("m"))
        .collect()
      val byCell = means.groupBy(_.getLong(0))
      cents = byCell.toSeq.sortBy(_._1).map { case (cid, rows) =>
        val v = new Array[Double](dim)
        rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
        (cid, v, math.sqrt(v.map(x => x * x).sum))
      }.filter(_._3 > 0d)
      require(cents.nonEmpty, "ivfTopK: Lloyd refinement emptied the centroid set")
    }
    cents
  }

  /** Per-query probe rows (query_id, qv, qn, cell_id): the nprobe
    * nearest cells, sort desc by (sim, -cell_id) — ties to the lowest
    * cell id, the same rule on every path.
    */
  private def probeFrame(queries: DataFrame, idCol: String, vecCol: String,
                         cents: Seq[(Long, Array[Double], Double)],
                         nprobe: Int, literalCentroidMax: Int): DataFrame =
    withCellSims(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
          VectorFunctions.normSq(col(vecCol)).as("qn")),
        "qv", cents, literalCentroidMax)
      .select(col("query_id"), col("qv"), col("qn"),
        explode(slice(reverse(array_sort(col("__sims"))), 1, nprobe)).as("probe"))
      .select(col("query_id"), col("qv"), col("qn"),
        (col("probe.nc") * -1).as("cell_id"))

  /** A persisted [[ivfTopK]] index: the centroid sidecar table paired
    * with a cell-partitioned store of (cand_id, cv, cn). Loaded once per
    * serving session ([[loadIvfCentroids]]) — nlist rows, model-sized.
    */
  case class IvfCentroids(cents: Seq[(Long, Array[Double], Double)],
                          cellOf: Map[Long, Int])

  def centroidsTable(table: String): String = table + "_centroids"

  /** Materialize [[ivfTopK]]'s cell assignment ONCE as a managed parquet
    * table PARTITIONED BY the (dense) cell index, plus an nlist-row
    * centroid sidecar — the serving twin of [[IvfPq.buildStore]] WITHOUT
    * the PQ compression: full vectors and norms are stored, so a probe
    * scores exact cosine and the one-shot [[ivfTopK]] oracle applies to
    * stored answers verbatim. Centroid derivation is [[deriveCentroids]]
    * with the same defaults, so the persisted cell structure is
    * bit-identical to what an inline search of the same corpus would
    * build. The partition key is the DENSE index of the centroid in
    * cid order (directory-typed int; original cids live in the sidecar),
    * so catalog partition pruning serves each probe from its nprobe
    * directories. At 100 TB: ONE assignment scan + one partitioned write
    * per corpus build, amortized over every query thereafter — a serving
    * loop must never pay the corpus-sized assignment again (the q217
    * round-14 defect).
    */
  def buildIvfStore(emb: DataFrame, idCol: String, vecCol: String,
                    table: String, nlist: Int = 16,
                    centroidStride: Long = 31L, lloydRounds: Int = 0,
                    literalCentroidMax: Int = 64): Unit = {
    val cents = initIvfStore(emb, idCol, vecCol, table, nlist,
      centroidStride, lloydRounds, literalCentroidMax)
    appendToIvfStore(emb, idCol, vecCol, table, cents, literalCentroidMax)
  }

  /** Initialize an IVF store WITHOUT corpus data: train the coarse
    * quantizer on `train` (a pure function of that frame — the full
    * corpus here, a sample at extreme scale), drop any prior store, and
    * persist the centroid sidecar. The data table then fills through
    * [[appendToIvfStore]] — the one-shot [[buildIvfStore]] and a
    * streamed corpus ingest produce row-identical stores because cell
    * assignment is per-row pure against these FIXED centroids. The
    * quantizer is trained once per store generation by design (the
    * FAISS contract): corpus drift degrades cell balance, not
    * correctness — exact cosine re-ranks whatever the probed cells
    * hold; re-init + re-ingest is the rebalance path.
    */
  def initIvfStore(train: DataFrame, idCol: String, vecCol: String,
                   table: String, nlist: Int = 16,
                   centroidStride: Long = 31L, lloydRounds: Int = 0,
                   literalCentroidMax: Int = 64): IvfCentroids = {
    val spark = train.sparkSession
    import spark.implicits._
    val cents = deriveCentroids(train, idCol, vecCol, nlist, centroidStride,
      lloydRounds, literalCentroidMax)
    val indexed = cents.sortBy(_._1).zipWithIndex
    graft.sources.Sinks.dropTableAndStaleLocation(spark, table)
    graft.sources.Sinks.dropTableAndStaleLocation(spark, centroidsTable(table))
    indexed.map { case ((cid, v, nrm), i) => (i, cid, v.toSeq, nrm) }
      .toDF("cell", "cid", "cvec", "cnorm")
      .coalesce(1).write.mode("overwrite").format("parquet")
      .saveAsTable(centroidsTable(table))
    IvfCentroids(indexed.map(_._1),
      indexed.map { case ((cid, _, _), i) => cid -> i }.toMap)
  }

  /** Append a batch of vectors to an [[initIvfStore]]'d store: assign
    * ONLY the batch rows to cells (O(batch) — never a corpus re-scan)
    * and append under the store's cell partitioning. Per-row pure
    * against the fixed centroids, so the accumulated store is
    * row-identical to a one-shot build however the batches slice;
    * at-least-once appends (the ledger crash window) duplicate exact
    * rows, which [[ivfTopKStored]]'s candidate dedup collapses.
    */
  def appendToIvfStore(batch: DataFrame, idCol: String, vecCol: String,
                       table: String, centroids: IvfCentroids,
                       literalCentroidMax: Int = 64): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cid2cell = centroids.cellOf.toSeq.toDF("cell_id", "cell")
    withCellId(batch, idCol, vecCol, centroids.cents, literalCentroidMax)
      .join(broadcast(cid2cell), "cell_id")
      .select(col("cand_id"), col("cv"), col("cn"), col("cell"))
      .write.mode("append").format("parquet")
      .partitionBy("cell").saveAsTable(table)
  }

  // ---- deletion (right-to-be-forgotten over embeddings) ----

  /** The tombstone table paired with an IVF store. */
  def ivfTombstoneTable(table: String): String = table + "_tombstones"

  /** Record deletions: append the ids' DISTINCT set to the tombstone
    * table — set-semantics state, so re-deleting an id is a no-op on
    * every read (the dedup-store tombstone argument verbatim). Between
    * this and [[purgeIvfTombstoned]], every serve reads through
    * [[liveIvfStore]], so a deleted embedding can neither be returned as
    * a candidate nor occupy a rank. Note the id is "forgotten" while the
    * tombstone stands: re-ingesting the same id before the purge stays
    * masked; re-ingest after the purge is a fresh document.
    */
  def deleteFromIvfStore(spark: org.apache.spark.sql.SparkSession,
                         table: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"deleteFromIvfStore expects a single-column id frame; got " +
        ids.columns.mkString("(", ", ", ")"))
    val t = ivfTombstoneTable(table)
    ids.select(col(ids.columns.head).as("cand_id")).distinct()
      .write.mode("append").format("parquet").saveAsTable(t)
    spark.catalog.refreshTable(t)
  }

  /** The IVF store with tombstoned embeddings MASKED: one anti-join on
    * cand_id before anything touches the rows. The tombstone set is
    * deletion-sized (AQE broadcasts it), and a cell filter pushes
    * through the anti-join's left side to the scan, so the probe path's
    * catalog partition pruning survives the mask (spec-pinned).
    */
  def liveIvfStore(spark: org.apache.spark.sql.SparkSession,
                   table: String): DataFrame = {
    val t = ivfTombstoneTable(table)
    val s = spark.table(table)
    if (spark.catalog.tableExists(t))
      s.join(spark.table(t).select(col("cand_id")).distinct(),
        Seq("cand_id"), "left_anti")
    else s
  }

  /** The PHYSICAL delete — and unlike the hash-bucketed dedup store
    * (whose purge must rewrite every bucket), the cell partitioning
    * localizes it: only the partitions that actually hold a tombstoned
    * row are rewritten (dynamic partition overwrite), a cell emptied
    * entirely is dropped from the catalog, and every untouched cell's
    * files are left alone. Deletion cost scales with the deleted cells'
    * size, not the corpus. Run between ingests; serves are unchanged by
    * construction (purge ≡ mask, spec-pinned).
    */
  def purgeIvfTombstoned(spark: org.apache.spark.sql.SparkSession,
                         table: String): Unit = {
    val t = ivfTombstoneTable(table)
    if (!spark.catalog.tableExists(t)) return
    val tomb = spark.table(t).select(col("cand_id")).distinct()
    val affected = spark.table(table)
      .join(tomb, Seq("cand_id"), "left_semi")
      .select(col("cell")).distinct().collect().map(_.getInt(0))
    if (affected.nonEmpty) {
      val survivors = spark.table(table)
        .filter(col("cell").isin(affected.map(Integer.valueOf): _*))
        .join(tomb, Seq("cand_id"), "left_anti")
        .select(col("cand_id"), col("cv"), col("cn"), col("cell"))
      val kept = survivors.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSet
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try survivors.write.mode("overwrite").insertInto(table)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // a cell whose every row was deleted writes nothing under dynamic
      // overwrite — drop its partition explicitly so the bytes leave disk
      (affected.toSet -- kept).foreach { c =>
        spark.sql(s"ALTER TABLE `$table` DROP IF EXISTS PARTITION (cell=$c)")
      }
    }
    graft.sources.Sinks.dropTableAndStaleLocation(spark, t)
    spark.catalog.refreshTable(table)
  }

  /** Load a [[buildIvfStore]] sidecar back into driver state — one
    * nlist-row read per serving session, cached by the caller (the
    * StoreIngest committed-map discipline), never per batch.
    */
  def loadIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       table: String): IvfCentroids = {
    val rows = spark.table(centroidsTable(table))
      .select(col("cell"), col("cid"), col("cvec"), col("cnorm"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray,
        r.getDouble(3)))
      .sortBy(_._1)
    require(rows.nonEmpty, s"empty centroid sidecar ${centroidsTable(table)}")
    IvfCentroids(
      rows.map { case (_, cid, v, nrm) => (cid, v, nrm) }.toSeq,
      rows.map { case (cell, cid, _, _) => cid -> cell }.toMap)
  }

  /** IVF top-k served FROM the persisted store: probe selection runs
    * against the loaded centroids (per-query work only), the scan reads
    * ONLY the probed cells' partitions (catalog partition pruning — the
    * IvfPq discipline), and scoring is the same exact cosine as
    * [[ivfTopK]] over the stored vectors — answers are bit-identical to
    * the inline path on the same corpus (spec-pinned). Per-batch cost is
    * O(|queries| + rows in nprobe cells); the corpus-wide assignment was
    * paid once at [[buildIvfStore]] time.
    */
  def ivfTopKStored(spark: org.apache.spark.sql.SparkSession, table: String,
                    centroids: IvfCentroids, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int, nprobe: Int = 4,
                    literalCentroidMax: Int = 64): DataFrame = {
    import spark.implicits._
    val probes = probeFrame(queries, idCol, vecCol, centroids.cents, nprobe,
      literalCentroidMax)
    val cid2cell = centroids.cellOf.toSeq.toDF("cell_id", "cell")
    val p = probes.join(broadcast(cid2cell), "cell_id")
      .select(col("cell"), col("query_id"), col("qv"), col("qn"))
    // the probed cell set is <= nlist values (bounded, model-sized): one
    // tiny job over the query batch, then a LITERAL partition filter so
    // pruning happens at the catalog before any data file opens
    val cells = p.select(col("cell")).distinct().collect().map(_.getInt(0))
    // read through the tombstone mask (a no-op when nothing is deleted);
    // the literal cell filter pushes through the anti-join's left side,
    // so catalog partition pruning is unchanged (spec-pinned)
    val scan = liveIvfStore(spark, table)
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scan.join(broadcast(p), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
      .select(col("query_id"), col("cand_id"), col("cos_sim"))
      // candidate dedup BEFORE ranking: store rows are at-least-once
      // (an appended batch replayed in the ledger crash window lands
      // twice), and a duplicate candidate would otherwise occupy two
      // ranks; a no-op on exactly-once stores, so inline parity holds
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-row array of (sim to centroid, -cell_id) structs, packed so
    * array_max/array_sort break similarity ties toward the smallest cell
    * id. ||v|| is constant across cells, so argmax over dot(v,c)/||c||
    * equals argmax over cosine — the row norm's sqrt is skipped entirely
    * during assignment.
    *
    * Small centroid sets become plan literals (codegen'd); large ones ride
    * as a single broadcast-joined array column (`__cents`), evaluated with
    * higher-order functions — same values, O(1) plan size.
    */
  private def withCellSims(df: DataFrame, vecCol: String,
                           cents: Seq[(Long, Array[Double], Double)],
                           literalCentroidMax: Int): DataFrame = {
    if (cents.size <= literalCentroidMax) {
      val sims = array(cents.map { case (cid, cv, cnorm) =>
        struct((VectorFunctions.dot(col(vecCol), lit(cv)) / lit(cnorm)).as("sim"),
          lit(-cid).as("nc"))
      }: _*)
      df.withColumn("__sims", sims)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val centsRow = cents.map { case (cid, cv, cnorm) => (cid, cv.toSeq, cnorm) }
        .toDF("cid", "cvec", "cnorm")
        .agg(collect_list(struct(col("cid"), col("cvec"), col("cnorm"))).as("__cents"))
      df.crossJoin(broadcast(centsRow))
        .withColumn("__sims", transform(col("__cents"), c =>
          struct((VectorFunctions.dotBuiltin(col(vecCol), c.getField("cvec"))
              / c.getField("cnorm")).as("sim"),
            (c.getField("cid") * -1).as("nc"))))
        .drop("__cents")
    }
  }

  /** Corpus rows tagged with their nearest cell: (cand_id, cv, cn, cell_id). */
  private def withCellId(emb: DataFrame, idCol: String, vecCol: String,
                         cents: Seq[(Long, Array[Double], Double)],
                         literalCentroidMax: Int): DataFrame =
    withCellSims(
        emb.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
          VectorFunctions.normSq(col(vecCol)).as("cn")),
        "cv", cents, literalCentroidMax)
      .withColumn("cell_id", array_max(col("__sims")).getField("nc") * -1)
      .drop("__sims")

  /** LSH-bucketed ANN: score only candidates in the query's hyperplane
    * bucket. Multi-probe = also search buckets at Hamming distance 1 when
    * `probeBits > 0` (improves recall at bounded extra cost).
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nPlanes: Int = 12, probeBits: Int = 0, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    val planes = VectorFunctions.seededPlanes(nPlanes, dim, seed)
    val bucketOf = (v: Column) => VectorFunctions.hyperplaneBucket(v, planes)
    val c = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      VectorFunctions.normSq(col(vecCol)).as("cn"),
      bucketOf(col(vecCol)).as("bucket"))
    val baseQ = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFunctions.normSq(col(vecCol)).as("qn"),
      bucketOf(col(vecCol)).as("bucket0"))
    // probe the home bucket plus single-bit flips of the first `probeBits` planes
    val probes = lit(0L) +: (0 until probeBits).map(i => shiftleft(lit(1L), i))
    val q = baseQ.select(col("query_id"), col("qv"), col("qn"),
        explode(array(probes.map(p => col("bucket0").bitwiseXOR(p)): _*)).as("bucket"))
      .distinct()
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.select(col("query_id"), col("cand_id"), col("cos_sim")).distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Index-quality monitoring: per-query recall@k of an approximate
    * top-k result against the exact one — the number an operator of a
    * 100 TB ANN serving store actually watches (bucket/cell parameters
    * drift as the corpus grows; recall is the alarm). Both inputs are
    * deterministic ranked frames (`query_id`, `cand_id`, ...), so the
    * report replays exactly — no sampling, no floats.
    *
    * Cost: one equi-join of two k·|queries|-sized frames + one count —
    * negligible next to producing either input. The exact side is the
    * ground truth ON THE QUERY SAMPLE ONLY (brute-force over a bounded
    * query draw — never corpus×corpus).
    *
    * @return (`query_id`, `n_hits`, `recall_bp`) — hits = |approx ∩
    *         exact|, recall in exact basis points ⌊10⁴·hits/k⌋;
    *         queries with zero overlap report 0, not absence
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val hits = exact.select(col("query_id"), col("cand_id"))
      .join(approx.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        // pure integer floor division (hits·10⁴ is non-negative) — the
        // "exact basis points" claim must hold by construction, not by
        // double division happening to be exact at small magnitudes
        graft.functions.IntOps.intDiv(
          coalesce(col("n_hits"), lit(0L)) * 10000L, lit(k))
          .as("recall_bp"))
  }
}
