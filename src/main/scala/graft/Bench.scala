package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** 1-minute load average from /proc/loadavg, -1.0 if unreadable. */
  private def loadavg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest scale factor: runs every query once so
    // JIT, whole-stage-codegen compilation, parquet footer caches, and the
    // Structured Streaming micro-batch machinery are all initialized before
    // anything is timed (JMH-style steady-state measurement). Falls back to
    // the bench dir itself if no smaller sibling exists.
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.getAbsolutePath else sfDir
    }
    // SPARK_GRAFT_ONLY=q44_org_paths,q13_closure — optional comma-separated
    // subset for isolated-query iteration; unset (the driver gate) runs all
    // MINUS SparkEntry.benchExclude (output-volume-bound gates whose
    // correctness Verify still pins — an explicit ONLY overrides the
    // exclusion so a demoted query can still be measured on demand).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        only.fold(!SparkEntry.benchExclude.contains(n))(_.contains(n)) }
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      Storage.releaseAll(spark)
    }
    // noop sink: forces full evaluation of every output column (count() would
    // let Catalyst prune the projections being measured). Three samples per
    // query, reporting the per-query MIN: two single-sample round-3 runs of
    // identical code disagreed by >6 s on individual queries (sandbox
    // scheduling noise), so one sample is not a number worth gating on.
    // Storage is released after every sample — outside the timed region — so
    // no query's measurement rides on caches leaked by an earlier one.
    //
    // LOW-CORE MODE (round 18): the driver also runs the bench at a reduced
    // core count to measure scaling, under a wall-clock budget. At 8 cores the
    // full methodology (warmup + 3 suite samples + isolated min-of-3 ≈ 7
    // executions × 267 queries) blew that budget (BENCH_r17_c8 rc 124, no
    // scaling data). When SPARK_GRAFT_CPUS ≤ 8 the bench drops to ONE suite
    // sample and skips the isolated pass (warmup kept — JIT/codegen state
    // must still be steady before the single timed sample). The final line
    // carries "samples" and "low_core_mode" so the two methodologies are
    // never silently compared.
    val lowCore = scala.util.Try(cpus.trim.toInt).toOption.exists(_ <= 8)
    val samples = if (lowCore) 1 else 3
    val loadStart = loadavg()
    // A failed query must never masquerade as a fast one (round 8: 11
    // analysis-failing events queries read as 0.05s "speedups" in the gate
    // artifact) — failures are tracked per query and surfaced in the JSON.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val results = ordered.map { case (name, fn) =>
      val times = (1 to samples).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name failed: $e")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        Storage.releaseAll(spark)
        dt
      }
      name -> times.min
    }
    // 4-decimal seconds (0.1 ms resolution — far below this box's noise
    // floor): full-precision doubles doubled the JSON line's length and
    // the round-12 gate artifact lost its TAIL to log capture, which is
    // exactly where queries_iso lives. Shorter line, same information.
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // ISOLATED min-of-3 pass (skippable with SPARK_GRAFT_NO_ISO=1): the
    // suite numbers above are measured back-to-back, so a query's figure
    // can ride on JVM/GC state its predecessors left behind and a
    // transient load spike taxes whichever query it lands on. This pass
    // re-times each query after a full storage release, an explicit GC,
    // and a short quiesce — per-query minimum over three samples. These
    // are the ROUND-OVER-ROUND comparison numbers; the suite totals
    // above keep their historical semantics (and their sensitivity to
    // sandbox load — read the loadavg fields before comparing those).
    val isoOpt = if (lowCore || sys.env.contains("SPARK_GRAFT_NO_ISO")) None else Some {
      val iso = ordered.filter { case (n, _) => !failed.contains(n) }
        .map { case (name, fn) =>
          Storage.releaseAll(spark)
          System.gc()
          Thread.sleep(100)
          val times = (1 to samples).map { _ =>
            val t0 = System.nanoTime()
            try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            catch { case _: Throwable => () }
            val dt = (System.nanoTime() - t0) / 1e9
            Storage.releaseAll(spark)
            dt
          }
          name -> times.min
        }
      val isoQs = iso.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      (fmt(iso.map(_._2).sum), isoQs)
    }
    // Self-labeling contention: 1-minute system load average at start and
    // end of the timed region. Round 3/4/5 gate runs each "regressed"
    // untouched queries by seconds under sandbox load that isolated re-runs
    // couldn't reproduce — a run whose loadavg dwarfs the worker count
    // should be read as contended, not as a code regression.
    //
    // THREE-LINE artifact (round 15): the gate's log-tail capture window
    // measured ~2 KB in practice (round 14's 6.6 KB final line still
    // parsed null), so per-query maps can never share a line with the
    // scalars the driver must parse. Detail lines print FIRST — the
    // in-suite map as "suite_detail", the isolated min-of-3 map as
    // "iso_detail" (the round-over-round comparison set; absent under
    // SPARK_GRAFT_NO_ISO, when the in-suite map is the only one — never
    // printed twice). The FINAL line is SCALARS ONLY (~250 bytes:
    // totals, failures, loadavg, sf) and always fits the window; the
    // per-query maps live in bench_last.json, the committed artifact of
    // record.
    val detailLine = s"""{"metric":"suite_detail","queries_kind":"in_suite","queries":$qs}"""
    val isoLine = isoOpt.map { case (_, isoQs) =>
      s"""{"metric":"iso_detail","queries_kind":"isolated_min_of_3","queries":$isoQs}""" }
    val isoTotalJson = isoOpt.fold("") { case (isoTotal, _) =>
      s""","total_iso":$isoTotal""" }
    // FINAL-LINE per-query map (round 18): the driver parses its JSON only
    // from the last ~2 KB of stdout (round 14's 6.6 KB inline map parsed
    // null; rounds 16-17's scalars-only line parsed but left the driver's
    // PERF per-query table empty). A 267-query map is ~7 KB and can NEVER
    // fit that window, so the final line carries the TOP QUERIES BY SUITE
    // TIME, greedily packed until the line reaches ~1.9 KB (~55 queries,
    // covering the large majority of suite seconds — exactly the entries a
    // per-query comparison is about). Values are the same in-suite numbers
    // as suite_detail, at 2 decimals to fit more entries; "queries_omitted"
    // counts the cheap tail left out; the COMPLETE 4-decimal maps stay in
    // bench_last.json, the committed artifact of record.
    val lineBudget = 1900
    def fmt2(v: Double): String = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val entries = results.sortBy(-_._2)
      .map { case (k, v) => s"\"" + k + "\":" + fmt2(v) }
    def lineWith(topQs: String, omitted: Int): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","samples":$samples,"failed":$failedJson,"loadavg_start":$loadStart,"loadavg_end":${loadavg()},"cpus":$cpus$isoTotalJson,"low_core_mode":$lowCore,"queries_kind":"in_suite_top_by_time","queries_omitted":$omitted,"queries":$topQs,"per_query":"bench_last.json","sf":"$sfDir"}"""
    val fixedLen = lineWith("{}", results.size).length
    val taken = new scala.collection.mutable.ArrayBuffer[String]()
    var used = fixedLen
    entries.foreach { e =>
      val add = e.length + (if (taken.isEmpty) 0 else 1)
      if (used + add <= lineBudget) { taken += e; used += add }
    }
    val line = lineWith(taken.mkString("{", ",", "}"), results.size - taken.size)
    println(detailLine)
    isoLine.foreach(println)
    println(line)
    // The gate artifact was truncated by log-tail capture in round 6 (lost
    // q01–q16 + loadavg fields) — also persist every line to a file so the
    // committed artifact is complete regardless of stdout capture. ONLY
    // full-suite runs write it: a SPARK_GRAFT_ONLY subset run must never
    // clobber the committed full-suite measurement (it did in rounds 8
    // and 9).
    if (only.isEmpty) {
      try {
        val w = new java.io.PrintWriter("bench_last.json")
        try {
          w.println(detailLine)
          isoLine.foreach(w.println)
          w.println(line)
        } finally w.close()
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
