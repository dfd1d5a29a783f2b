package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ invariants: probe ranking matches a driver recompute with the
  * (dist, cid) tiebreak, the stored search equals full ADC restricted to
  * the probed cells (and equals it EXACTLY at nprobe = nlist), the store
  * scan prunes to the probed cells' partitions, rebuilds replace, and
  * the search terminates in TakeOrdered. The independent end-to-end
  * check is the q124 oracle, which replays both quantizer levels.
  */
class IvfPqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dim = 8
  // 5 tight clusters of 24 vectors; cluster c centers at 10·c per dim
  private lazy val vecs = (0 until 120).map { i =>
    val c = i % 5
    (i.toLong, (0 until dim).map(j =>
      10.0 * c + ((i * 7 + j * 13) % 10) * 0.05).toArray)
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")
  private val scale = 1000000L

  private def scaled(v: Array[Double]): Array[Long] =
    v.map(x => math.floor(x * scale).toLong)

  private def distSq(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("probeCells ranks by exact distance, ties to the lowest cell id") {
    val model = IvfPq.fit(df, "vec_id", "embedding", dim,
      nlist = 5, m = 2, k = 4, iterations = 2)
    val q = scaled(vecs.head._2)
    val expected = model.coarse.zipWithIndex
      .map { case (c, cid) => (distSq(q, c), cid) }
      .sorted.take(3).map(_._2).toSeq
    assert(IvfPq.probeCells(model, q, 3).toSeq == expected)
    // a duplicated centroid forces a genuine tie → lowest cid must win
    val tied = model.copy(coarse = Array(model.coarse(1), model.coarse(0),
      model.coarse(0)))
    val got = IvfPq.probeCells(tied, scaled(vecs.head._2), 2)
    assert(got.toSeq == got.toSeq.sorted)
  }

  test("stored search equals driver-side ADC restricted to probed cells; " +
      "nprobe = nlist recovers the full ADC ranking") {
    val t = "graft_ivfpq_spec"
    dropTable(t)
    val m = 2; val k = 4; val iters = 2; val nlist = 5
    val model = IvfPq.fit(df, "vec_id", "embedding", dim, nlist, m, k, iters)
    IvfPq.buildStore(df, "vec_id", "embedding", model, t)
    val q = scaled(vecs.head._2)
    val subDim = dim / m

    // driver recompute: cell + codes + adc for every vector
    val rows = vecs.map { case (id, v) =>
      val x = scaled(v)
      val cell = model.coarse.zipWithIndex
        .map { case (c, cid) => (distSq(x, c), cid) }.min._2
      val adc = (0 until m).map { s =>
        val xs = x.slice(s * subDim, (s + 1) * subDim)
        val code = model.codebooks(s).zipWithIndex
          .map { case (c, cid) => (distSq(xs, c), cid) }.min._2
        distSq(q.slice(s * subDim, (s + 1) * subDim), model.codebooks(s)(code))
      }.sum
      (id, cell, adc)
    }

    for (nprobe <- Seq(2, nlist)) {
      val probes = IvfPq.probeCells(model, q, nprobe).toSet
      val expected = rows
        .filter { case (id, cell, _) => id != 0L && probes.contains(cell) }
        .sortBy { case (id, _, adc) => (adc, id) }.take(10)
        .map { case (id, cell, adc) => (id, cell, adc) }
      val got = IvfPq.searchStored(spark, t, model, "vec_id", q,
          nprobe = nprobe, topK = 10, excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      assert(got == expected, s"nprobe=$nprobe")
    }
    dropTable(t)
  }

  test("store scan prunes to the probed cells' partitions") {
    val t = "graft_ivfpq_prune"
    dropTable(t)
    val model = IvfPq.fit(df, "vec_id", "embedding", dim,
      nlist = 5, m = 2, k = 4, iterations = 2)
    IvfPq.buildStore(df, "vec_id", "embedding", model, t)
    val q = scaled(vecs.head._2)
    val search = IvfPq.searchStored(spark, t, model, "vec_id", q,
      nprobe = 2, topK = 10)
    val p = search.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    // the pruned scan must touch strictly fewer files than the store holds
    val allFiles = spark.table(t).inputFiles.length
    val probes = IvfPq.probeCells(model, q, 2).toSet
    val cellsHeld = spark.table(t).select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(probes.subsetOf(cellsHeld) && cellsHeld.size > probes.size,
      s"probes=$probes cells=$cellsHeld")
    assert(allFiles >= cellsHeld.size)
    dropTable(t)
  }

  test("rebuild replaces the prior store") {
    val t = "graft_ivfpq_rebuild"
    dropTable(t)
    val model = IvfPq.fit(df, "vec_id", "embedding", dim,
      nlist = 3, m = 2, k = 4, iterations = 1)
    IvfPq.buildStore(df, "vec_id", "embedding", model, t)
    IvfPq.buildStore(df, "vec_id", "embedding", model, t)
    assert(spark.table(t).count() == vecs.length)
    assert(spark.table(t).groupBy(col("vec_id")).count()
      .filter(col("count") > 1).isEmpty)
    dropTable(t)
  }

  test("residual encoding beats plain PQ on offset-dominated clusters") {
    // 4 clusters at large per-dim offsets; fine structure is the SAME
    // pattern family in every cluster. Plain PQ's k=4-entry codebooks
    // mostly re-encode the offsets; residual codebooks see only the fine
    // structure and resolve it.
    val d2 = 8
    val vecs2 = (0 until 120).map { i =>
      val c = i % 4
      (i.toLong, (0 until d2).map(j =>
        100.0 * c + ((i / 4) * 13 + j * 7) % 29 * 0.7).toArray)
    }
    val df2 = vecs2.toDF("vec_id", "embedding")
    val qv = vecs2.head._2
    val exact = vecs2.filter(_._1 != 0L).map { case (id, v) =>
      id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sortBy { case (id, dd) => (dd, id) }.take(15).map(_._1).toSet

    def recall(residual: Boolean): Int = {
      val t = s"graft_ivfpq_rec_$residual"
      dropTable(t)
      val got = IvfPq.buildAndSearch(df2, "vec_id", "embedding", d2,
          nlist = 4, m = 2, k = 4, iterations = 3, table = t,
          queryId = 0L, nprobe = 1, topK = 15, residual = residual)
        .collect().map(_.getLong(0)).toSet
      dropTable(t)
      (exact & got).size
    }
    val plain = recall(residual = false)
    val res = recall(residual = true)
    assert(res > plain, s"residual recall $res must beat plain $plain")
    assert(res >= 12, s"residual recall too low: $res/15")
  }

  test("residual searchStored equals a driver-side residual-ADC recompute") {
    val t = "graft_ivfpq_res_spec"
    dropTable(t)
    val m = 2; val k = 4; val iters = 2; val nlist = 5
    val model = IvfPq.fit(df, "vec_id", "embedding", dim, nlist, m, k, iters,
      residual = true)
    IvfPq.buildStore(df, "vec_id", "embedding", model, t)
    val q = scaled(vecs.head._2)
    val subDim = dim / m
    val probes = IvfPq.probeCells(model, q, 2).toSet

    val rows = vecs.map { case (id, v) =>
      val x = scaled(v)
      val cell = model.coarse.zipWithIndex
        .map { case (c, cid) => (distSq(x, c), cid) }.min._2
      val rx = x.indices.map(j => x(j) - model.coarse(cell)(j)).toArray
      val qr = q.indices.map(j => q(j) - model.coarse(cell)(j)).toArray
      val adc = (0 until m).map { s =>
        val xs = rx.slice(s * subDim, (s + 1) * subDim)
        val code = model.codebooks(s).zipWithIndex
          .map { case (c, cid) => (distSq(xs, c), cid) }.min._2
        distSq(qr.slice(s * subDim, (s + 1) * subDim), model.codebooks(s)(code))
      }.sum
      (id, cell, adc)
    }
    val expected = rows
      .filter { case (id, cell, _) => id != 0L && probes.contains(cell) }
      .sortBy { case (id, _, adc) => (adc, id) }.take(10)
    val got = IvfPq.searchStored(spark, t, model, "vec_id", q,
        nprobe = 2, topK = 10, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expected)
    dropTable(t)
  }

  test("saveModel/loadModel round-trips both encodings losslessly") {
    for (residual <- Seq(false, true)) {
      val t = s"graft_ivfpq_model_$residual"
      dropTable(t)
      val m = IvfPq.fit(df, "vec_id", "embedding", dim,
        nlist = 5, m = 2, k = 4, iterations = 2, residual = residual)
      IvfPq.saveModel(spark, m, t)
      val l = IvfPq.loadModel(spark, t)
      assert(l.dim == m.dim && l.scale == m.scale && l.residual == m.residual)
      assert(l.coarse.map(_.toSeq).toSeq == m.coarse.map(_.toSeq).toSeq)
      assert(l.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
        m.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
      dropTable(t)
    }
  }

  test("search from a loaded model equals search from the fitted one") {
    val mt = "graft_ivfpq_model_rt"; val st = "graft_ivfpq_store_rt"
    dropTable(mt); dropTable(st)
    val m = IvfPq.fit(df, "vec_id", "embedding", dim,
      nlist = 5, m = 2, k = 4, iterations = 2)
    IvfPq.saveModel(spark, m, mt)
    val l = IvfPq.loadModel(spark, mt)
    IvfPq.buildStore(df, "vec_id", "embedding", l, st)
    val q = scaled(vecs.head._2)
    val a = IvfPq.searchStored(spark, st, m, "vec_id", q, 2, 10, Some(0L))
      .collect().map(_.toSeq).toSeq
    val b = IvfPq.searchStored(spark, st, l, "vec_id", q, 2, 10, Some(0L))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    dropTable(mt); dropTable(st)
  }

  test("saveModel clears an orphaned warehouse directory; replaces a known table without touching the FS path") {
    // (a) orphan: a previous session's surviving managed directory with no
    // catalog entry (in-memory catalog + durable warehouse) must be cleared
    // through the shared Sinks.dropTableAndStaleLocation discipline
    val t = "graft_ivfpq_model_orphan"
    dropTable(t)
    val db = new java.net.URI(spark.catalog.getDatabase("default").locationUri)
    val orphan = new java.io.File(
      if (db.getScheme == null) new java.io.File(db.getPath)
      else new java.io.File(db), t)
    orphan.mkdirs()
    val stale = new java.io.File(orphan, "stale.parquet")
    java.nio.file.Files.write(stale.toPath, Array[Byte](1, 2, 3))
    val m = IvfPq.fit(df, "vec_id", "embedding", dim,
      nlist = 3, m = 2, k = 4, iterations = 1)
    IvfPq.saveModel(spark, m, t)
    assert(!stale.exists(), "the stale file must be cleaned before the write")
    assert(IvfPq.loadModel(spark, t).coarse.length == m.coarse.length)
    // (b) known table: a re-save goes through the catalog's own overwrite —
    // the orphan branch must NOT run (a healthy non-file warehouse is never
    // touched), and the reload reflects the new fit
    val m2 = IvfPq.fit(df, "vec_id", "embedding", dim,
      nlist = 5, m = 2, k = 4, iterations = 1)
    IvfPq.saveModel(spark, m2, t)
    assert(IvfPq.loadModel(spark, t).coarse.length == 5)
    dropTable(t)
  }

  test("saveModel rejects qualified table names (unqualified-name contract)") {
    val m = IvfPq.fit(df, "vec_id", "embedding", dim,
      nlist = 3, m = 2, k = 4, iterations = 1)
    assertThrows[IllegalArgumentException] {
      IvfPq.saveModel(spark, m, "default.graft_ivfpq_model_bad")
    }
  }

  test("buildAndSearch end-to-end returns plausible neighbors") {
    val t = "graft_ivfpq_e2e"
    dropTable(t)
    val out = IvfPq.buildAndSearch(df, "vec_id", "embedding", dim,
      nlist = 5, m = 2, k = 8, iterations = 3, table = t,
      queryId = 0L, nprobe = 2, topK = 23)
      .collect().map(_.getLong(0))
    assert(out.length == 23)
    // clustered corpus: the probed-cell ADC neighborhood is cluster 0
    val sameCluster = out.count(_ % 5 == 0)
    assert(sameCluster >= 18, s"recall too low: $sameCluster/23")
    dropTable(t)
  }
}
