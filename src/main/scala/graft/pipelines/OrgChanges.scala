package graft.pipelines

import graft.ops.Closure
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full re-derivation of the succession-paths table from a raw successor
  * edge list — scripts/org-changes/build_all_org_changes.R:62-231, the
  * richest relational program in the reference: iterative path expansion
  * with per-hop dates and change types, name-change vs merger refinement,
  * split detection, and the complicated/adjacent-path classification.
  *
  * Scale posture: the edge list (organisational changes) is tiny relative
  * to any fact table — change-EVENT-sized, thousands of rows for a national
  * registry over decades — so the expansion broadcasts it and the finished
  * table is collected to the driver for downstream broadcast use (the same
  * bounded-artifact contract as the closure mapping and IVF centroids).
  * The round-6 shape ran the refinement/classification steps as ~20 small
  * broadcast-join jobs in SERIES — 6.8 s of pure job-scheduling latency at
  * any data size. Since the classification operates on exactly the rows the
  * final collect returns anyway, it now runs driver-side on the collected
  * paths in one pass: TWO Spark jobs total (edge-table leaf + expansion
  * collect), identical output (GoldenDerivePathsSpec pins all 677 rows
  * byte-exact).
  *
  * Input schema: (old_code, new_code, change_date) — one row per
  * succession edge; multiple rows per old_code encode a split.
  * Output schema = the committed all_org_changes_paths CSV.
  */
object OrgChangePaths {

  def derivePaths(successors: DataFrame, maxHops: Int = 3): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val spark = successors.sparkSession

    val edges = successors.select(col("old_code").as("e_src"),
      col("new_code").as("e_dst"), col("change_date").as("e_date"))
    // a src with >1 successors is a split — every branch row is typed 'split'
    // (build_all_org_changes.R:100-102: lengths(new_code_var) > 1).
    // Leafed onto a cached RDD so the maxHops expansion joins broadcast the
    // materialized rows instead of re-running the count aggregation (and so
    // the analyzer sees a leaf, not maxHops copies of the groupBy subtree).
    val withCnt = edges.join(
      edges.groupBy(col("e_src")).agg(count(lit(1)).as("e_nsucc")), Seq("e_src"))
    val edgesRdd = withCnt.rdd
    edgesRdd.cache()
    edgesRdd.count()
    val edgesC = spark.createDataFrame(edgesRdd, withCnt.schema)

    // Every code ever seen starts its own chain (R:62-68); codes that never
    // changed drop out after expansion via the !is.na(new_code_1) filter.
    val allCodes = edges.select(col("e_src").as("code"))
      .union(edges.select(col("e_dst"))).distinct()

    var m = allCodes.select(col("code").as("old_code"), col("code").as("new_code_0"))
    for (i <- 1 to maxHops) {
      m = m.join(broadcast(edgesC), col(s"new_code_${i - 1}") === col("e_src"), "left")
        .withColumn(s"new_code_$i", col("e_dst"))
        .withColumn(s"date_change_$i", col("e_date"))
        .withColumn(s"change_type_$i",
          when(col("e_dst").isNull, lit(null).cast("string"))
            .when(col("e_nsucc") > 1, lit("split"))
            .otherwise(lit("merger_or_name_change")))
        .drop("e_src", "e_dst", "e_date", "e_nsucc")
    }
    val expanded = m.filter(col("new_code_1").isNotNull)
    // The ONE collect: every step below reads only these rows, and the
    // finished table is driver-materialized for broadcast reuse anyway.
    val pathRows = expanded.collect()
    edgesRdd.unpersist(blocking = false)

    val sch = expanded.schema
    val iOld = sch.fieldIndex("old_code")
    val iNc = (0 to maxHops).map(i => sch.fieldIndex(s"new_code_$i"))
    val iDate = (1 to maxHops).map(i => sch.fieldIndex(s"date_change_$i"))
    val iCt = (1 to maxHops).map(i => sch.fieldIndex(s"change_type_$i"))
    def str(r: Row, i: Int): String = if (r.isNullAt(i)) null else r.getString(i)

    // One mutable record per chain; ct is the refinement's working copy.
    final class Chain(val row: Row) {
      val old: String = str(row, iOld)
      val nc: Array[String] = (0 to maxHops).map(i => str(row, iNc(i))).toArray
      val ct: Array[String] =
        (Seq[String](null) ++ (1 to maxHops).map(i => str(row, iCt(i - 1)))).toArray
      def hasCt(v: String): Boolean = (1 to maxHops).exists(i => ct(i) == v)
      var finalCode: String = _
      var split: Boolean = false
      var dpc: String = "no"
      var adj: Int = 0
      var inCompl: Boolean = false
    }
    val paths = pathRows.map(new Chain(_))

    // original paths = chains not contained in a longer one (R:112-117)
    val succCodes: Set[String] =
      paths.iterator.flatMap(c => (1 to maxHops).iterator.map(c.nc(_))).filter(_ != null).toSet
    val o = paths.filter(c => !succCodes.contains(c.old))

    // name-change refinement (R:119-144): a merger target reached from only
    // ONE distinct predecessor is a pure renaming, not a merger — every row
    // with that target is relabeled (whatever its own change type), then
    // the remaining merger_or_name_change downgrade to merger. Rounds are
    // independent: round i writes only ct(i) and reads nc(i-1)/nc(i)/ct(i).
    for (i <- 1 to maxHops) {
      val nameChanged: Set[String] = o.filter(_.nc(i) != null).groupBy(_.nc(i))
        .collect { case (target, rows)
          if rows.iterator.map(_.nc(i - 1)).distinct.size == 1 &&
            rows.exists(_.ct(i) == "merger_or_name_change") => target }
        .toSet
      o.foreach { c =>
        if (c.nc(i) != null && nameChanged.contains(c.nc(i))) c.ct(i) = "name_change"
        else if (c.ct(i) == "merger_or_name_change") c.ct(i) = "merger"
      }
    }

    o.foreach { c =>
      c.finalCode = (maxHops to 1 by -1).iterator.map(c.nc(_)).find(_ != null).orNull
      c.split = c.hasCt("split")
    }

    // complicated-path classification (R:152-231), on the chains touching
    // any code of a splitting chain
    val linked: Set[String] = o.iterator.filter(_.split)
      .flatMap(c => (c.old +: (1 to maxHops).map(c.nc(_))).filter(_ != null)).toSet
    val compl = o.filter(c =>
      (c.old +: (1 to maxHops).map(c.nc(_))).exists(x => x != null && linked.contains(x)))
    compl.foreach { c =>
      c.inCompl = true
      c.dpc =
        if (c.hasCt("merger") && c.split) "later_merger"
        else if (c.hasCt("name_change") && c.split) "later_name_change"
        else "no"
      c.adj = if (!c.split) 1 else 0
    }

    // a target multiple distinct trusts split INTO is itself complicated
    // (R:196-216); rounds are sequential — round i reads round i-1's labels
    for (i <- 1 to maxHops) {
      val sfm: Set[String] = compl.iterator
        .filter(c => c.ct(i) == "split" && c.dpc == "no").toSeq
        .groupBy(_.nc(i))
        .collect { case (target, rows)
          if rows.iterator.map(_.nc(i - 1)).distinct.size > 1 => target }
        .toSet
      compl.foreach { c =>
        if (c.nc(i) != null && sfm.contains(c.nc(i)) && c.adj == 0)
          c.dpc = "split_from_multiple"
      }
    }

    // a clean split with one branch feeding a split_from_multiple target is
    // adjacent to the complication (R:218-226)
    val sic: Set[String] =
      compl.iterator.filter(_.dpc == "split_from_multiple").map(_.old).toSet
    compl.foreach { c => if (sic.contains(c.old) && c.dpc == "no") c.adj = 1 }

    // chains ending cleanly everywhere are NOT complicated (R:228-236);
    // everything else sharing that final code is
    val ncs: Set[String] = compl.groupBy(_.finalCode)
      .collect { case (f, rows)
        if rows.forall(_.adj == 0) && rows.forall(_.dpc == "no") => f }.toSet
    val pcp: Set[String] = compl.iterator.map(_.finalCode).toSet -- ncs

    // re-attach the classification by full code chain (plyr::join on the
    // common columns, R:239-244): only chains whose final code is part of
    // a complicated path keep their labels; everything else resets to the
    // clean defaults.
    val rows: Array[Row] = o.map { c =>
      val keep = c.inCompl && pcp.contains(c.finalCode)
      val hopVals = (1 to maxHops).flatMap(i =>
        Seq(c.row.get(iNc(i)), c.row.get(iDate(i - 1)), c.ct(i)))
      Row.fromSeq(
        Seq(c.row.get(iOld), c.row.get(iNc(0))) ++ hopVals ++ Seq(
          c.finalCode,
          if (c.split) 1 else 0,
          if (keep) c.dpc else "no",
          if (keep) c.adj else 0,
          if (pcp.contains(c.finalCode)) 1 else 0))
    }
    val byName = sch.fields.map(f => f.name -> f).toMap
    val outSchema = StructType(
      Seq(byName("old_code"), byName("new_code_0")) ++
        (1 to maxHops).flatMap(i => Seq(byName(s"new_code_$i"),
          byName(s"date_change_$i"), byName(s"change_type_$i"))) ++
        Seq(StructField("final_code", byName("new_code_1").dataType),
          StructField("experiences_split", IntegerType, nullable = false),
          StructField("direct_path_complicated",
            org.apache.spark.sql.types.StringType, nullable = false),
          StructField("adjacent_to_complicated", IntegerType, nullable = false),
          StructField("part_of_complicated_path", IntegerType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), outSchema)
  }
}

/** Org-change lookup derivations over the committed succession-paths table
  * (`data/org-changes/all_org_changes_paths_2000_2018.csv`), re-expressing
  * scripts/org-changes/build_trust_lookup.R Spark-first. The closure itself
  * runs on the generic [[graft.ops.Closure]] pointer-doubling operator;
  * GoldenOrgChangesSpec pins both stages against the committed outputs.
  */
object OrgChanges {

  /** Edge list (src → dst) from the paths table's hop columns
    * (new_code_0 = old_code, hops new_code_1..3; NA-terminated).
    */
  def edgesFromPaths(paths: DataFrame): DataFrame = {
    val hops = Seq("new_code_0" -> "new_code_1", "new_code_1" -> "new_code_2",
      "new_code_2" -> "new_code_3")
    hops.map { case (a, b) =>
      paths.filter(col(b).isNotNull && col(b) =!= "NA")
        .select(col(a).as("src"), col(b).as("dst"))
    }.reduce(_ union _).distinct()
  }

  /** Every code appearing anywhere in a chain. */
  def allCodes(paths: DataFrame): DataFrame =
    Seq("old_code", "new_code_1", "new_code_2", "new_code_3")
      .map(c => paths.filter(col(c).isNotNull && col(c) =!= "NA").select(col(c).as("node")))
      .reduce(_ union _).distinct()

  /** (old_code, final_code, hops): closure of every known code. */
  def resolved(paths: DataFrame): DataFrame =
    Closure.resolve(allCodes(paths), edgesFromPaths(paths))

  /** Re-derivation of trust_lookup_uncomplicated_changes.csv
    * (build_trust_lookup.R:66-109): closure mapping, minus identity rows,
    * joined to the unproblematic path classification, clean splits re-coded
    * as backwards mergers by swapping old/final (the reference's U6 value
    * swap, build_trust_lookup.R:104-107).
    */
  def trustLookup(paths: DataFrame): DataFrame = {
    val mapping = resolved(paths)
      .select(col("old_code"), col("final_code"))
      .filter(col("old_code") =!= col("final_code"))
      .distinct()

    val unproblematic = paths
      .filter(col("part_of_complicated_path") === "0")
      .select(col("experiences_split").cast("int").as("experiences_split"), col("final_code"))
      .distinct()

    val joined = mapping.join(broadcast(unproblematic), Seq("final_code"), "left")
      .withColumn("problematic", when(col("experiences_split").isNull, 1).otherwise(0))

    // U6 value swap: clean splits become backwards mergers
    val swap = col("experiences_split") === 1 && col("problematic") === 0
    joined.select(
      when(swap, col("final_code")).otherwise(col("old_code")).as("old_code"),
      when(swap, col("old_code")).otherwise(col("final_code")).as("final_code"),
      col("experiences_split"),
      col("problematic"))
  }
}
