package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Round-18 phase-timing probe (driver-side tooling, like Plans):
  * replays selected gates with per-phase wall timers so optimization
  * targets the measured phase, not a guess. Usage:
  *   runMain graft.ProbeR18 <sfDir> <probe>[,<probe>...]
  */
object ProbeR18 {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probes = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_PROBE_JOBS")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val cs = Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
            starts.put(j.jobId, (System.nanoTime(), cs))
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(j.jobId)
            if (s != null)
              println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2}")
          }
        })
    }
    if (probes("q262")) q262(spark, sfDir)
    if (probes("q252")) q252(spark, sfDir)
    if (probes("q232")) q232(spark, sfDir)
    if (probes("q207")) q207(spark, sfDir)
    if (probes("q114")) q114(spark, sfDir)
    if (probes("q214")) q214(spark, sfDir)
    if (probes("q236")) q236(spark, sfDir)
    if (probes("q174")) q174(spark, sfDir)
    if (probes("q117")) q117(spark, sfDir)
    spark.stop()
  }

  private def q174(s: SparkSession, dir: String): Unit = {
    println("== q174_ct_langid phases ==")
    val docs = Tables(s, dir).documents
    val prof = graft.operators.LangIdProfiles.trainProfiles(docs, "lang", "text",
      topK = 50)
    t("trainProfiles noop")(noop(prof))
    val out = graft.operators.LangIdProfiles.classify(docs, "doc_id", "text", prof,
      topM = 20, penalty = 50L)
    t("classify (incl retrain) noop")(noop(out))
    Storage.releaseAll(s)
  }

  private def q117(s: SparkSession, dir: String): Unit = {
    println("== q117_mad_outliers phases ==")
    val in = Tables(s, dir).lineitem.select(col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"),
      (col("l_extendedprice") *
        when(col("l_orderkey") % 499 === 0, 20).otherwise(1)).as("price"))
    val out = graft.ops.Percentiles.madOutliers(in, Seq("l_returnflag"), "price",
      threshold = 3.5)
    t("madOutliers noop")(noop(out))
    t("madOutliers again")(noop(out))
    Storage.releaseAll(s)
  }

  /** q236 dbscan phases. */
  private def q236(s: SparkSession, dir: String): Unit = {
    println("== q236_dbscan phases ==")
    val emb = Tables(s, dir).embeddings
    val asg = graft.operators.KMeans.assignAuto(emb, "vec_id", "embedding",
      targetClusterSize = 250L, iterations = 5)
      .withColumnRenamed("cluster", "cell")
    t("assignAuto noop")(noop(asg))
    val out = graft.operators.Dbscan.clusterCells(emb.join(asg, "vec_id"),
      "vec_id", "embedding", "cell", eps = 0.35, minPts = 2)
    t("full dbscan noop")(noop(out))
    t("full dbscan again")(noop(out))
    Storage.releaseAll(s)
  }

  /** joinContainmentWeighted phases with BOTH verify shapes timed. */
  private def q214(s: SparkSession, dir: String): Unit = {
    println("== q214_weighted_watchlist phases ==")
    val tau = 0.95
    val docs = Tables(s, dir).documents
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val n = Tables(s, dir).documents.count()
    val weights = docs
      .select(explode(array_distinct(col("toks"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .select(col("tok"),
        (lit(1L) + graft.functions.IntOps.intDiv(lit(n), col("df"))).as("w"))
    val subjects = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val w = weights.select(col("tok"), col("w").cast("long").as("w"))
    def tw(d: DataFrame) = d.select(col("doc_id"),
        explode(array_distinct(col("toks"))).as("tok"))
      .join(w, Seq("tok"), "left")
      .withColumn("w", coalesce(col("w"), lit(1L)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val twA = tw(subjects)
    val twB = tw(docs)
    t("twA build")(twA.count()); t("twB build")(twB.count())
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("w").desc, col("tok"))
    val ordW = byDoc
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val allW = byDoc
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    def ranked(tf: DataFrame) = tf
      .withColumn("wtotal", sum(col("w")).over(allW))
      .withColumn("suf", col("wtotal") - sum(col("w")).over(ordW) + col("w"))
    val preA = ranked(twA)
      .filter(col("suf").cast("double") >= col("wtotal") * lit(tau) - lit(1e-6))
      .select(col("doc_id").as("doc_a"), col("wtotal").as("wa"),
        col("suf").as("sufa"), col("tok").as("ptok"))
    val allB = ranked(twB)
      .select(col("doc_id").as("doc_b"), col("wtotal").as("wb"),
        col("suf").as("sufb"), col("tok").as("ptok"))
    val cand = preA.join(allB, "ptok")
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("wb").cast("double") >= col("wa") * lit(tau) - lit(1e-6))
      .filter(least(col("sufa"), col("sufb")).cast("double") >=
        col("wa") * lit(tau) - lit(1e-6))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("cand join+distinct")(println(s"  cand rows = ${cand.count()}"))
    // OLD verify: token equi-join
    val sharedOld = cand
      .join(twA.select(col("doc_id").as("doc_a"), col("tok"), col("w")), Seq("doc_a"))
      .join(twB.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("w")).as("shared"))
    val totalsA = twA.groupBy(col("doc_id")).agg(sum(col("w")).as("wa"))
    val outOld = sharedOld
      .join(totalsA.select(col("doc_id").as("doc_a"), col("wa")), "doc_a")
      .withColumn("wcontainment", col("shared").cast("double") / col("wa"))
      .filter(col("wcontainment") >= lit(tau))
      .select(col("doc_a"), col("doc_b"), col("wcontainment"))
    t("verify OLD equi-join")(noop(outOld))
    // NEW verify: encoded arrays
    def arrs(tf: DataFrame) = tf
      .groupBy(col("doc_id"))
      .agg(collect_list(concat(col("w").cast("string"), lit(" "), col("tok")))
          .as("ewts"),
        sum(col("w")).as("wtotal"))
    val withArrs = cand
      .join(arrs(twA).select(col("doc_id").as("doc_a"), col("ewts").as("ea"),
        col("wtotal").as("wa")), "doc_a")
      .join(arrs(twB).select(col("doc_id").as("doc_b"), col("ewts").as("eb")),
        "doc_b")
    val outNew = withArrs
      .withColumn("shared", aggregate(array_intersect(col("ea"), col("eb")),
        lit(0L), (acc, x) => acc + substring_index(x, " ", 1).cast("long")))
      .withColumn("wcontainment", col("shared").cast("double") / col("wa"))
      .filter(col("wcontainment") >= lit(tau))
      .select(col("doc_a"), col("doc_b"), col("wcontainment"))
    t("verify NEW arrays")(noop(outNew))
    t("verify NEW arrays again")(noop(outNew))
    t("verify OLD again")(noop(outOld))
    Storage.releaseAll(s)
  }

  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** joinSelfWeighted sub-phases, replayed step by step with the same
    * persists the operator uses, each phase noop-timed.
    */
  private def q207(s: SparkSession, dir: String): Unit = {
    println("== q207_setsim_weighted phases ==")
    val tau = 0.95
    val docs = Tables(s, dir).documents
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val n = t("docs.count")(Tables(s, dir).documents.count())
    val weights = docs
      .select(explode(array_distinct(col("toks"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .select(col("tok"),
        (lit(1L) + graft.functions.IntOps.intDiv(lit(n), col("df"))).as("w"))
    t("weights noop")(noop(weights))
    val w = weights.select(col("tok"), col("w").cast("long").as("w"))
    val tw = docs.select(col("doc_id"),
        explode(array_distinct(col("toks"))).as("tok"))
      .join(w, Seq("tok"), "left")
      .withColumn("w", coalesce(col("w"), lit(1L)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("tw build+persist")(tw.count())
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    val ordW = byDoc.orderBy(col("w").desc, col("tok"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = tw
      .withColumn("wtotal", sum(col("w")).over(byDoc))
      .withColumn("suf", col("wtotal") - sum(col("w")).over(ordW) + col("w"))
    val pre = ranked
      .filter(col("suf").cast("double") >= col("wtotal") * lit(tau) - lit(1e-6))
      .select(col("doc_id"), col("wtotal"), col("tok").as("ptok"), col("suf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("pre (2 windows)+persist")(pre.count())
    val minPairShared = (col("wa") + col("wb")).cast("double") *
      lit(tau / (1.0 + tau)) - lit(1e-6)
    val cand = pre
      .select(col("doc_id").as("doc_a"), col("wtotal").as("wa"),
        col("suf").as("sufa"), col("ptok"))
      .join(pre.select(col("doc_id").as("doc_b"), col("wtotal").as("wb"),
        col("suf").as("sufb"), col("ptok")), "ptok")
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("wa").cast("double") >= col("wb") * lit(tau) - lit(1e-6) &&
        col("wb").cast("double") >= col("wa") * lit(tau) - lit(1e-6))
      .filter(least(col("sufa"), col("sufb")).cast("double") >= minPairShared)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("cand join+distinct")(println(s"  cand rows = ${cand.count()}"))
    val totals = tw.groupBy(col("doc_id")).agg(sum(col("w")).as("wtotal"))
    val shared = cand
      .join(tw.select(col("doc_id").as("doc_a"), col("tok"), col("w")), Seq("doc_a"))
      .join(tw.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("w")).as("shared"))
    val out = shared
      .join(totals.select(col("doc_id").as("doc_a"), col("wtotal").as("wa")), "doc_a")
      .join(totals.select(col("doc_id").as("doc_b"), col("wtotal").as("wb")), "doc_b")
      .withColumn("wjaccard", col("shared").cast("double") /
        (col("wa") + col("wb") - col("shared")))
      .filter(col("wjaccard") >= lit(tau))
      .select(col("doc_a"), col("doc_b"), col("wjaccard"))
    t("verify noop")(noop(out))
    Storage.releaseAll(s)
  }

  /** joinBy (jaccard) sub-phases for q114. */
  private def q114(s: SparkSession, dir: String): Unit = {
    println("== q114_setsim_join phases ==")
    val tau = 0.9
    val docs0 = Tables(s, dir).documents
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val docs = docs0
      .select(col("doc_id"), array_distinct(col("toks")).as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") > 0)
    val tok = docs.select(col("doc_id"), col("n"), explode(col("ts")).as("tok"))
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    t("dfreq noop")(noop(dfreq))
    def cmin(nc: org.apache.spark.sql.Column) =
      ceil(nc * lit(tau) - lit(1e-6)).cast("int")
    val ordered = tok.join(dfreq, "tok")
      .groupBy(col("doc_id"), col("n"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("o"))
      .withColumn("ots", transform(col("o"), x => x.getField("tok")))
      .withColumn("p", greatest(col("n") - cmin(col("n")) + 1, lit(1)))
      .select(col("doc_id"), col("n"), col("ots"), col("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("ordered build+persist")(ordered.count())
    val pre = ordered.select(col("doc_id"), col("n"),
      posexplode(slice(col("ots"), lit(1), col("p"))).as(Seq("i0", "ptok")))
    val cand = pre
      .select(col("doc_id").as("doc_a"), col("n").as("na"), col("i0").as("ia"), col("ptok"))
      .join(pre.select(col("doc_id").as("doc_b"), col("n").as("nb"),
        col("i0").as("ib"), col("ptok")), "ptok")
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("na") >= col("nb") * lit(tau) - lit(1e-6) &&
        col("nb") >= col("na") * lit(tau) - lit(1e-6))
      .filter(lit(1) + least(col("na") - (col("ia") + 1), col("nb") - (col("ib") + 1)) >=
        ceil((col("na") + col("nb")) * lit(tau / (1.0 + tau)) - lit(1e-6)).cast("int"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("cand join+distinct")(println(s"  cand rows = ${cand.count()}"))
    val withSets = cand
      .join(ordered.select(col("doc_id").as("doc_a"), col("ots").as("ta")), "doc_a")
      .join(ordered.select(col("doc_id").as("doc_b"), col("ots").as("tb")), "doc_b")
    val inter = size(array_intersect(col("ta"), col("tb")))
    val out = withSets
      .withColumn("jaccard", inter.cast("double") / (size(col("ta")) + size(col("tb")) - inter))
      .filter(col("jaccard") >= lit(tau))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    t("verify noop")(noop(out))
    Storage.releaseAll(s)
  }

  private def q262(s: SparkSession, dir: String): Unit = {
    println("== q262_stream_session_store ==")
    val table = "graft_stream_session_store"
    t("drop tables") {
      Seq(table, graft.streaming.StoreIngest.ledgerTable(table),
          graft.streaming.StoreIngest.tailsTable(table))
        .foreach(graft.sources.Sinks.dropTableAndStaleLocation(s, _))
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_probe_sess_").toString
    val in = java.nio.file.Files
      .createTempDirectory("graft_probe_sess_in_").toString
    val ev = Tables(s, dir).events
      .select(col("user_id"), col("ts"), col("event_id"))
    val n = t("count")(ev.count())
    val ranked = ev.withColumn("__grn",
      row_number().over(Window.orderBy(col("ts"), col("event_id"))))
      .persist()
    t("slice writes") {
      val stamped = scala.collection.mutable.Set[java.nio.file.Path]()
      for (g <- 0L to 2L) {
        ranked.filter(col("__grn") > g * n / 3 && col("__grn") <= (g + 1) * n / 3)
          .drop("__grn").coalesce(1).write.mode("append").parquet(in)
        val ft = java.nio.file.attribute.FileTime.fromMillis(1000L * (g + 1))
        val it = java.nio.file.Files.list(java.nio.file.Paths.get(in))
        try it.iterator().forEachRemaining { p =>
          if (!stamped.contains(p)) {
            java.nio.file.Files.setLastModifiedTime(p, ft); stamped += p
          }
        } finally it.close()
      }
    }
    ranked.unpersist(blocking = false)
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    t("stream (3 batches)") {
      val q = graft.streaming.StoreIngest.ingestSessionStore(stream, "user_id",
        unix_micros(col("ts").cast("timestamp")), col("event_id"),
        gapUs = 1800000000L, table, ckpt)
      q.awaitTermination()
      q.recentProgress.foreach(p =>
        println(s"[batch ${p.batchId}] durationMs=${p.durationMs}"))
    }
    t("serve + noop") {
      graft.streaming.StoreIngest.sessionsFromStore(s, table)
        .write.mode("overwrite").format("noop").save()
    }
    Storage.releaseAll(s)
  }

  private def q252(s: SparkSession, dir: String): Unit = {
    println("== q252_stream_skipgram_store ==")
    val table = "graft_stream_skipgram_store"
    t("drop tables") {
      Seq(table, graft.streaming.StoreIngest.ledgerTable(table),
          graft.streaming.StoreIngest.tailsTable(table))
        .foreach(graft.sources.Sinks.dropTableAndStaleLocation(s, _))
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_probe_sg_").toString
    val in = java.nio.file.Files
      .createTempDirectory("graft_probe_sg_in_").toString
    val ev = Tables(s, dir).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val n = t("count")(ev.count())
    val ranked = ev.withColumn("__grn",
      row_number().over(Window.orderBy(col("ts"), col("event_id"))))
      .persist()
    t("slice writes") {
      val stamped = scala.collection.mutable.Set[java.nio.file.Path]()
      for (g <- 0L to 2L) {
        ranked.filter(col("__grn") > g * n / 3 && col("__grn") <= (g + 1) * n / 3)
          .drop("__grn").coalesce(1).write.mode("append").parquet(in)
        val ft = java.nio.file.attribute.FileTime.fromMillis(1000L * (g + 1))
        val it = java.nio.file.Files.list(java.nio.file.Paths.get(in))
        try it.iterator().forEachRemaining { p =>
          if (!stamped.contains(p)) {
            java.nio.file.Files.setLastModifiedTime(p, ft); stamped += p
          }
        } finally it.close()
      }
    }
    ranked.unpersist(blocking = false)
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    t("stream (3 batches)") {
      graft.streaming.StoreIngest.ingestSkipGramStore(stream, "user_id",
        "event_type", col("ts"), col("event_id"), window = 3, table, ckpt)
        .awaitTermination()
    }
    t("serve + noop") {
      graft.streaming.StoreIngest.skipGramFromStore(s, table)
        .write.mode("overwrite").format("noop").save()
    }
    Storage.releaseAll(s)
  }

  private def q232(s: SparkSession, dir: String): Unit = {
    println("== q232_stream_dist_store ==")
    val table = "graft_stream_dist_store"
    t("drop tables") {
      Seq(table, graft.streaming.StoreIngest.distanceEdgeTable(table),
          graft.streaming.StoreIngest.ledgerTable(table))
        .foreach(graft.sources.Sinks.dropTableAndStaleLocation(s, _))
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_probe_dist_").toString
    val li = graft.streaming.EventStreams
      .readParquetStream(s, dir, "lineitem.parquet")
    val pairs = li.select(
      concat(lit("p"), col("l_partkey").cast("string")).as("src"),
      concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
    val edges = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    import s.implicits._
    val seeds = Seq("p0", "p1", "p2").toDF("node")
    t("stream") {
      graft.streaming.StoreIngest.ingestDistanceStore(edges, "src", "dst",
        seeds, table, ckpt)
        .awaitTermination()
    }
    t("serve + noop") {
      graft.operators.Bfs.distancesFromStore(s, table)
        .write.mode("overwrite").format("noop").save()
    }
    Storage.releaseAll(s)
  }
}
