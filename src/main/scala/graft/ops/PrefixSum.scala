package graft.ops

import graft.functions.{IntOps, PortableHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed global prefix sum, and the sequence-packing operator built
  * on it ("concatenate the corpus and cut every B tokens" — how training
  * examples are packed from variable-length documents).
  *
  * A global running total is the textbook case where the obvious Spark
  * plan does not scale: `sum(...).over(Window.orderBy(key))` with no
  * partition key collapses the whole dataset into ONE task
  * (`Exchange SinglePartition`). This operator is the two-phase scan used
  * by TeraSort-style jobs instead:
  *
  *   1. range-repartition by the order key (`RangePartitioning` — the
  *      same machinery as a distributed sort) and sort within partitions;
  *   2. aggregate ONE subtotal per partition and collect them — the only
  *      driver-side data is `numPartitions` longs (bounded by the
  *      partition count, not the data);
  *   3. ship the exclusive per-partition offsets back in the task closure
  *      and scan each partition once, seeding its running total with its
  *      offset.
  *
  * Every phase is balanced across executors; no task ever sees more than
  * its partition, and the range shuffle is the ONLY full-data exchange
  * (phase 3 is a per-partition scan in place — plan-pinned). The
  * partitioned frame is persisted (DISK_ONLY) so the subtotal job and the
  * caller's action observe identical partition ids — release it via
  * [[graft.Storage.releaseAll]] after the action, the same caller-release
  * contract as the dedup signature tables.
  */
object PrefixSum {

  /** Adds `out` = the EXCLUSIVE running total of `valueCol` (cast to
    * long) over rows in ascending `orderCols` order: the sum of all
    * strictly-preceding rows, 0 for the global first row. The order key
    * should be unique (tie-break with the row id) — equal keys get an
    * arbitrary but deterministic relative order within a partition.
    */
  def exclusiveCumsum(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
                      out: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
             else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(np, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.DISK_ONLY)
    // One long per partition to the driver — bounded by np, not the data.
    val partials = parted.groupBy(col("__pid")).agg(sum(col("__v")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = (0 until np).map(partials.getOrElse(_, 0L))
      .scanLeft(0L)(_ + _).init.zipWithIndex.map { case (off, p) => (p, off) }.toMap
    // Within-partition exclusive running total as a per-partition scan over
    // the persisted frame, seeded with the partition's broadcast offset.
    // The obvious Window.partitionBy(__pid) would shuffle the WHOLE dataset
    // a second time (Catalyst cannot prove the RangePartitioning output
    // satisfies a hash partitionBy, so it inserts another full exchange +
    // re-sort); the scan below reads the rows where the range shuffle left
    // them — the ONE full-data exchange is the range partition itself
    // (plan-pinned). Rows are already sorted within partitions, and the
    // persisted frame guarantees the scan sees the same partition ids the
    // subtotal job computed.
    val schema = parted.schema
    val pidIdx = schema.fieldIndex("__pid")
    val vIdx = schema.fieldIndex("__v")
    val keepIdx = schema.fields.indices
      .filterNot(i => i == pidIdx || i == vIdx).toArray
    val outSchema = org.apache.spark.sql.types.StructType(
      keepIdx.map(schema.fields) :+
        org.apache.spark.sql.types.StructField(out,
          org.apache.spark.sql.types.LongType, nullable = false))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    parted.mapPartitions { rows =>
      var seeded = false
      var running = 0L
      rows.map { r =>
        if (!seeded) { running = offsets.getOrElse(r.getInt(pidIdx), 0L); seeded = true }
        val vals = new Array[Any](keepIdx.length + 1)
        var i = 0
        while (i < keepIdx.length) { vals(i) = r.get(keepIdx(i)); i += 1 }
        vals(keepIdx.length) = running
        // sum() over the window skipped nulls; the scan does the same
        if (!r.isNullAt(vIdx)) running += r.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
    }
  }

  /** Adds `out` = the INCLUSIVE running maximum of `valueCol` (cast to
    * long) within each `groupCols` group over rows in ascending
    * `orderCols` order — the max of this row and every preceding row of
    * the same group. This is the shuffle-parallel replacement for
    * `max(v).over(Window.partitionBy(group).orderBy(order))` when the
    * group cardinality is LOW (a handful of event types): that window
    * hashes each group to ONE task which sorts the whole group forever —
    * the same scale-killer class as the unpartitioned cumsum above, just
    * with |groups| tasks instead of one. Here the data range-partitions on
    * (group, order) — every group spreads across many partitions — and the
    * only driver-side data is one max per (partition × group) boundary
    * row, bounded by np × |groups|, not the data. The running max is
    * associative, so the same subtotal/offset/scan decomposition as the
    * prefix sum applies verbatim with max in place of +.
    *
    * Null values never advance the running max (window-max semantics):
    * `out` is null until the group's first non-null value. Same
    * persist/release contract as [[exclusiveCumsum]].
    */
  def runningMax(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
                 valueCol: Column, out: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
             else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sortCols = groupCols.map(col) ++ orderCols
    val parted = df
      .withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.DISK_ONLY)
    // One max per (partition, group) to the driver — np × |groups| rows,
    // the low-cardinality regime this operator exists for.
    val partials = parted.groupBy((col("__pid") +: groupCols.map(col)): _*)
      .agg(max(col("__v")).as("__m"))
      .collect().map { r =>
        val g = groupCols.indices.map(i => r.get(i + 1)).toList
        val mIdx = groupCols.length + 1
        (r.getInt(0), g, if (r.isNullAt(mIdx)) None else Some(r.getLong(mIdx)))
      }
    // Exclusive seed for (partition, group) = max over the group's rows in
    // all EARLIER partitions; absent ⇒ the group starts in this partition.
    val seeds: Map[(Int, List[Any]), Long] = partials.groupBy(_._2)
      .flatMap { case (g, rows) =>
        rows.sortBy(_._1).scanLeft((-1, Option.empty[Long])) {
          case ((_, acc), (pid, _, m)) => (pid, (acc ++ m).reduceOption(_ max _))
        }.sliding(2).collect {
          case Array((_, acc), (pid, _)) if acc.isDefined => (pid, g) -> acc.get
        }
      }
    val schema = parted.schema
    val pidIdx = schema.fieldIndex("__pid")
    val vIdx = schema.fieldIndex("__v")
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val keepIdx = schema.fields.indices
      .filterNot(i => i == pidIdx || i == vIdx).toArray
    val outSchema = org.apache.spark.sql.types.StructType(
      keepIdx.map(schema.fields) :+
        org.apache.spark.sql.types.StructField(out,
          org.apache.spark.sql.types.LongType, nullable = true))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    parted.mapPartitions { rows =>
      // rows arrive sorted by (group, order): groups are contiguous, so one
      // running value suffices, re-seeded at each group boundary.
      var pid = -1
      var curGroup: List[Any] = null
      var seeded = false
      var running: Option[Long] = None
      rows.map { r =>
        if (pid < 0) pid = r.getInt(pidIdx)
        val g = gIdx.map(i => r.get(i)).toList
        if (!seeded || g != curGroup) {
          curGroup = g; seeded = true
          running = seeds.get((pid, g))
        }
        if (!r.isNullAt(vIdx)) {
          val v = r.getLong(vIdx)
          running = Some(running.fold(v)(_ max v))
        }
        val vals = new Array[Any](keepIdx.length + 1)
        var i = 0
        while (i < keepIdx.length) { vals(i) = r.get(keepIdx(i)); i += 1 }
        vals(keepIdx.length) = running.map(Long.box).orNull
        org.apache.spark.sql.Row.fromSeq(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
    }
  }

  /** Sequence packing: orders documents deterministically by portable hash
    * of (salt, id), lays their token counts end-to-end, and cuts the
    * resulting token stream into bins of `binTokens` — each row gains its
    * global `start_offset` plus the first/last bin it lands in and the
    * number of bins it spans (documents crossing a cut belong to several).
    * Membership is a pure function of (salt, corpus), so re-packing is
    * reproducible across runs and engines. Rows whose `tokensCol` is not
    * positive are dropped (they occupy no bin).
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    binTokens: Long, salt: String = "pack",
                    numPartitions: Int = 0): DataFrame = {
    require(binTokens > 0, "binTokens must be positive")
    val h = PortableHash.hash60(
      concat(lit(salt + ":"), col(idCol).cast("string")))
    val cum = exclusiveCumsum(
      df.filter(col(tokensCol) > 0).withColumn("__h", h),
      Seq(col("__h"), col(idCol)), col(tokensCol), "start_offset",
      numPartitions)
    val b = lit(binTokens)
    cum
      .withColumn("bin_first", IntOps.intDiv(col("start_offset"), b))
      .withColumn("bin_last",
        IntOps.intDiv(col("start_offset") + col(tokensCol).cast("long") - 1, b))
      .withColumn("n_bins", col("bin_last") - col("bin_first") + 1)
      .drop("__h")
  }
}
