package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed billion-scale ANN shape (Jégou et al. 2011,
  * the FAISS `IVFPQ` layout with `by_residual=false`) — an IVF coarse
  * quantizer partitions the corpus into cells, product-quantization
  * codes compress every vector to m small indices, and the two are
  * MATERIALIZED as one cell-partitioned codes table. A query then
  *
  *   1. ranks the nlist coarse centroids against the query on the
  *      driver (nlist·d exact-long ops — trivial) and keeps the nprobe
  *      nearest cells,
  *   2. scans ONLY those cells' partitions — catalog partition pruning,
  *      the storage analog of FAISS's inverted lists (PlanSpec pins
  *      the pruned scan), and
  *   3. re-ranks the surviving codes by the ADC sum of m exact-long
  *      table lookups, terminated by TakeOrderedAndProject.
  *
  * Per-query work is therefore (nprobe/nlist)·n code rows × m lookups —
  * independent of d at scan time, and the scan reads code columns of a
  * few bytes per row instead of d floats. At 100 TB the store is built
  * once per corpus (one Lloyd fit per level + ONE encode scan + one
  * partitioned write) and amortized over every query; cells are
  * directory partitions, so adding `nprobe` stays an O(cells-touched)
  * read no matter how the corpus grows.
  *
  * Everything inherits the fixed-point determinism contract of
  * [[KMeans.fit]] / [[ProductQuantizer]]: coarse assignment and PQ
  * codes are exact-long argmins with lowest-cid ties, the probe ranking
  * is `ORDER BY (dist, cid)` over exact longs, and the ADC score is a
  * sum of m exact longs — NO floats anywhere including training, so the
  * FULL pipeline (coarse Lloyd chain + m per-subspace Lloyd chains +
  * probe selection + ADC) replays in a DuckDB oracle with zero
  * tolerance (q124).
  *
  * Both FAISS encodings are supported. `residual = false` (q124) keeps
  * codes a pure function of the vector — the PQ chains are exactly
  * q123's and one table set serves every cell. `residual = true`
  * (q143) encodes x − coarse[cell]: the shared codebooks spend their
  * resolution on WITHIN-cell structure instead of re-encoding cell
  * offsets, which buys recall (measured in IvfPqSpec on an
  * offset-clustered corpus) at the cost of per-probed-cell query
  * tables and an oracle that threads the coarse assignment through
  * every PQ chain.
  */
object IvfPq {

  /** A trained IVF-PQ model: `coarse(cid)(j)` are the nlist cell
    * centroids, `codebooks(s)(cid)(j)` the m per-subspace PQ codebooks —
    * all scaled longs from the shared fixed-point domain. With
    * `residual = true` the codebooks are trained on (and codes encode)
    * x − coarse[cell] — FAISS's `by_residual=true`: one shared codebook
    * set spends its resolution on WITHIN-cell structure instead of
    * re-encoding each cell's offset, which is where the recall gain
    * comes from (IvfPqSpec measures it). The costs: queries need one
    * distance table PER PROBED CELL (nprobe× the table work — still
    * driver-trivial), and the oracle must thread the coarse assignment
    * through every PQ chain (q143 does).
    */
  case class Model(coarse: Array[Array[Long]],
                   codebooks: Array[Array[Array[Long]]],
                   dim: Int, scale: Long, residual: Boolean = false) {
    def m: Int = codebooks.length
    def subDim: Int = dim / m
  }

  /** (idCol, cell, rx): each point's coarse cell and its exact-long
    * residual from that cell's centroid — the residual-PQ training and
    * encoding input. The centroid lookup is a broadcast join against
    * the nlist-row centroid frame; the subtraction is a codegen'd
    * zip_with.
    */
  private def residualFrame(points: DataFrame, idCol: String, vecCol: String,
                            coarse: Array[Array[Long]],
                            scale: Long): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val scaled = transform(col(vecCol), x =>
      floor(x.cast("double") * lit(scale.toDouble)).cast("long"))
    val b = spark.sparkContext.broadcast(coarse)
    val cents = coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "__c")
    points.select(col(idCol), scaled.as("__x"),
        KMeans.nearestCentroidBcast(scaled, b).as("cell"))
      .join(broadcast(cents), "cell")
      .select(col(idCol), col("cell"),
        zip_with(col("__x"), col("__c"), (a, c) => a - c).as("rx"))
  }

  /** Train both levels: one flat Lloyd fit at k = nlist over the full
    * vectors (the coarse quantizer), then [[ProductQuantizer.train]]'s m
    * per-subspace fits. Both use the k-lowest-id deterministic init, so
    * the oracle's CTE chains replay each level independently.
    */
  def fit(points: DataFrame, idCol: String, vecCol: String, dim: Int,
          nlist: Int, m: Int, k: Int, iterations: Int,
          scale: Long = 1000000L, residual: Boolean = false): Model = {
    require(nlist >= 1, "nlist must be >= 1")
    val coarse = KMeans.fit(points, idCol, vecCol, nlist, iterations, scale)._2
    val books =
      if (!residual)
        ProductQuantizer.train(points, idCol, vecCol, dim, m, k, iterations, scale)
      else {
        // residuals are ALREADY scaled longs: train at scale 1, where
        // floor(double(x)·1) is the identity on the long domain
        val rf = residualFrame(points, idCol, vecCol, coarse, scale)
        ProductQuantizer.train(rf, idCol, "rx", dim, m, k, iterations, scale = 1L)
      }
    Model(coarse, books, dim, scale, residual)
  }

  /** One scan over the corpus producing (idCol, code_0..code_{m-1},
    * cell): the m PQ argmins AND the coarse-cell argmin evaluated
    * against broadcast codebooks — no joins, no shuffle.
    */
  def encodeWithCell(points: DataFrame, idCol: String, vecCol: String,
                     model: Model): DataFrame = {
    val spark = points.sparkSession
    if (model.residual) {
      val rf = residualFrame(points, idCol, vecCol, model.coarse, model.scale)
      val codeCols = (0 until model.m).map { s =>
        val b = spark.sparkContext.broadcast(model.codebooks(s))
        KMeans.nearestCentroidBcast(
          slice(col("rx"), s * model.subDim + 1, model.subDim), b).as(s"code_$s")
      }
      rf.select((col(idCol) +: codeCols) :+ col("cell"): _*)
    } else {
      val scaled = transform(col(vecCol), x =>
        floor(x.cast("double") * lit(model.scale.toDouble)).cast("long"))
      val bCoarse = spark.sparkContext.broadcast(model.coarse)
      val codeCols = (0 until model.m).map { s =>
        val b = spark.sparkContext.broadcast(model.codebooks(s))
        KMeans.nearestCentroidBcast(
          slice(scaled, s * model.subDim + 1, model.subDim), b).as(s"code_$s")
      }
      points.select(
        (col(idCol) +: codeCols) :+
          KMeans.nearestCentroidBcast(scaled, bCoarse).as("cell"): _*)
    }
  }

  /** Materialize [[encodeWithCell]] as a managed parquet table
    * PARTITIONED BY cell — each IVF inverted list is one directory, so
    * a probe's `cell IN (...)` filter prunes at the catalog before any
    * file is opened. Same rebuild contract as
    * [[InvertedIndex.buildPhraseStore]]: a build replaces any prior
    * store under this name, including a stale warehouse directory
    * orphaned by a previous session (in-memory catalog + durable
    * warehouse), removed through the Hadoop FileSystem API so file:,
    * hdfs:// and object-store schemes all resolve.
    */
  def buildStore(points: DataFrame, idCol: String, vecCol: String,
                 model: Model, table: String): Unit = {
    val spark = points.sparkSession
    graft.sources.Sinks.dropTableAndStaleLocation(spark, table)
    encodeWithCell(points, idCol, vecCol, model)
      .write.mode("overwrite").format("parquet")
      .partitionBy("cell").saveAsTable(table)
  }

  /** The nprobe cells nearest a scaled query vector: exact long squared
    * distances against the coarse centroids, ties to the LOWEST cell id
    * — the driver-side mirror of the oracle's `ORDER BY d2, cid LIMIT
    * nprobe`.
    */
  def probeCells(model: Model, q: Array[Long], nprobe: Int): Array[Int] = {
    require(q.length == model.dim,
      s"query vector has dim ${q.length}, expected ${model.dim}")
    model.coarse.zipWithIndex
      .map { case (c, cid) =>
        var acc = 0L
        var j = 0
        while (j < q.length) { val d = q(j) - c(j); acc += d * d; j += 1 }
        (acc, cid)
      }
      .sortBy(identity)
      .take(nprobe).map(_._2)
  }

  /** ADC top-k over the stored codes, restricted to the query's nprobe
    * nearest cells. The scan carries a `cell IN (...)` partition filter
    * (pruned at the catalog — PlanSpec pin) and sums m literal-array
    * lookups; TakeOrderedAndProject terminates it, never a global sort.
    * @return (cand_id, cell, adc_dist) — the query row itself excluded
    */
  def searchStored(spark: SparkSession, table: String, model: Model,
                   idCol: String, q: Array[Long], nprobe: Int, topK: Int,
                   excludeId: Option[Long] = None): DataFrame = {
    val probes = probeCells(model, q, nprobe)

    def tableFor(qv: Array[Long], s: Int): Column = {
      val qSub = qv.slice(s * model.subDim, (s + 1) * model.subDim)
      typedLit(model.codebooks(s).map { c =>
        var acc = 0L
        var j = 0
        while (j < qSub.length) { val d = qSub(j) - c(j); acc += d * d; j += 1 }
        acc
      }.toSeq)
    }

    val adc: Column =
      if (!model.residual) {
        (0 until model.m).map(s =>
          element_at(tableFor(q, s), col(s"code_$s") + 1)).reduce(_ + _)
      } else {
        // codes encode x − coarse[cell], so the query compares through
        // its PER-CELL residual: one m-table set per probed cell,
        // selected by a when-chain over the (small) probe list
        val perCell = probes.map { c =>
          val qr = q.indices.map(j => q(j) - model.coarse(c)(j)).toArray
          c -> (0 until model.m).map(s =>
            element_at(tableFor(qr, s), col(s"code_$s") + 1)).reduce(_ + _)
        }
        perCell.tail.foldLeft(
          when(col("cell") === perCell.head._1, perCell.head._2)) {
          case (acc, (c, e)) => acc.when(col("cell") === c, e)
        }
      }

    val base = spark.table(table)
      .filter(col("cell").isin(probes.map(Integer.valueOf): _*))
    excludeId.fold(base)(id => base.filter(col(idCol) =!= id))
      .select(col(idCol).as("cand_id"), col("cell"), adc.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("cand_id").asc)
      .limit(topK)
  }

  /** Persist a trained model as a tiny parquet table — the SERVING
    * story: fit once, save, and every later session loads + probes
    * without refitting (the [[IncrementalKmv]] persistence discipline
    * applied to the model rather than the data). Layout: one `meta`
    * row carries (dim, scale, residual, m, nlist) in its vals; `coarse`
    * rows carry one centroid each (a = cid); `book` rows one codebook
    * entry each (a = subspace, b = cid). Total rows = 1 + nlist + m·k —
    * model-sized, never data-sized.
    */
  def saveModel(spark: SparkSession, model: Model, table: String): Unit = {
    import spark.implicits._
    val meta = Seq(("meta", 0, 0, Seq(model.dim.toLong, model.scale,
      if (model.residual) 1L else 0L, model.m.toLong,
      model.coarse.length.toLong)))
    val coarse = model.coarse.zipWithIndex.map { case (c, i) =>
      ("coarse", i, 0, c.toSeq) }.toSeq
    val books = for ((bk, s) <- model.codebooks.zipWithIndex.toSeq;
                     (c, cid) <- bk.zipWithIndex)
      yield ("book", s, cid, c.toSeq)
    val df = (meta ++ coarse ++ books).toDF("kind", "a", "b", "vals")
    graft.sources.Sinks.dropTableAndStaleLocation(spark, table)
    df.coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Load a [[saveModel]] table back into a [[Model]]. */
  def loadModel(spark: SparkSession, table: String): Model = {
    val rows = spark.table(table).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getSeq[Long](3).toArray))
    val meta = rows.find(_._1 == "meta")
      .getOrElse(throw new IllegalStateException(s"no meta row in $table"))._4
    val Array(dim, scale, residual, m, nlist) = meta
    val coarse = rows.filter(_._1 == "coarse").sortBy(_._2).map(_._4)
    require(coarse.length == nlist.toInt, s"expected $nlist coarse rows")
    val books = Array.tabulate(m.toInt) { s =>
      val bs = rows.filter(r => r._1 == "book" && r._2 == s).sortBy(_._3)
      bs.map(_._4)
    }
    Model(coarse, books, dim.toInt, scale, residual == 1L)
  }

  /** End-to-end convenience (the q124 gate shape): fit both levels,
    * build the partitioned store, probe with `queryId`'s own vector —
    * the honest build + encode + one-query cost.
    */
  def buildAndSearch(points: DataFrame, idCol: String, vecCol: String,
                     dim: Int, nlist: Int, m: Int, k: Int, iterations: Int,
                     table: String, queryId: Long, nprobe: Int, topK: Int,
                     scale: Long = 1000000L, residual: Boolean = false): DataFrame = {
    val model = fit(points, idCol, vecCol, dim, nlist, m, k, iterations, scale,
      residual)
    buildStore(points, idCol, vecCol, model, table)
    val q = points.filter(col(idCol) === queryId)
      .select(transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale.toDouble)).cast("long")))
      .head().getSeq[Long](0).toArray
    searchStored(points.sparkSession, table, model, idCol, q, nprobe, topK,
      excludeId = Some(queryId))
  }
}
